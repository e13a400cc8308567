"""rcot_tpu.utils"""
