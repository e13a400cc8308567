"""rcot_tpu.parallel"""
