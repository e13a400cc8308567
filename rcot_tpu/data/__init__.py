"""rcot_tpu.data"""
