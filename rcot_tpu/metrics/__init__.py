"""rcot_tpu.metrics"""
