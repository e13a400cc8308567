"""rcot_tpu.compat"""
