"""rcot_tpu.train"""
