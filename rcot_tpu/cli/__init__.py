"""rcot_tpu.cli"""
