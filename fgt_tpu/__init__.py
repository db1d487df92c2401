"""fgt_tpu — a TPU-native (JAX/XLA/Pallas) video-inpainting framework.

Re-implements, TPU-first, the full capability surface of the FGT reference
system ("Flow-Guided Transformer for Video Inpainting", ECCV 2022):

  * flow estimation   — RAFT (``fgt_tpu.models.raft``)
  * flow completion   — LAFC / LAFC-single (``fgt_tpu.models.lafc``)
  * content synthesis — flow-guided transformer (``fgt_tpu.models.fgt``) plus
    classical flow-guided gradient propagation + Poisson blending
    (``fgt_tpu.pipeline``)

Design notes
------------
* All dense compute is JAX (NHWC layouts, bf16-friendly, static shapes).
* Models are flax.linen modules; temporal axes are folded into batch so the
  MXU sees large batched convolutions / matmuls.
* Multi-chip scaling uses ``jax.sharding.Mesh`` + jit shardings (data
  parallelism over the batch/window axis), not NCCL-style process groups.
* The CPU-side classical stages (region fill, flowNN propagation, Poisson
  blend) live in ``fgt_tpu.pipeline`` and are vectorized numpy/scipy.
"""

__version__ = "0.1.0"
