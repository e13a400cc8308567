"""rcot_tpu.models"""
