"""Model zoo: RAFT (flow estimation), LAFC / LAFC-single (flow completion),
FGT (flow-guided transformer inpainter), T-PatchGAN discriminator."""

from fgt_tpu.models.registry import build_model, MODELS
