"""Inference pipeline: the six-stage video inpainting driver and its
classical CPU stages (flowNN gradient propagation, Poisson blending)."""
