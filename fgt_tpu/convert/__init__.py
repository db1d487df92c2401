"""Checkpoint conversion: reference PyTorch weights -> fgt_tpu param trees."""
