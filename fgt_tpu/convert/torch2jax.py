"""Convert reference PyTorch checkpoints to fgt_tpu flax param trees.

The reference ships ``.pth.tar`` checkpoints whose module names follow the
PyTorch trees documented in SURVEY.md §2.1 (FGT/models/model.py,
LAFC/models/lafc.py, LAFC/models/lafc_single.py, RAFT/raft.py,
FGT/models/temporal_patch_gan.py). Each ``*_mapping`` function enumerates a
flat ``flax path -> (torch key, transform kind)`` table; :func:`apply_mapping`
walks the flax template and fills every leaf.

Transform kinds:
  conv2d  OIHW   -> HWIO
  conv3d  OIDHW  -> DHWIO
  dwconv2d (O,1,kh,kw) -> (kh,kw,1,O)  (depthwise, feature_group_count=C)
  linear  (out,in) -> (in,out)
  raw     copied as-is (biases, norms, running stats, spectral u)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _to_numpy(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _transform(kind: str, arr: np.ndarray) -> np.ndarray:
    if kind == "conv2d":
        return arr.transpose(2, 3, 1, 0)
    if kind == "conv3d":
        return arr.transpose(2, 3, 4, 1, 0)
    if kind == "dwconv2d":
        return arr.transpose(2, 3, 1, 0)
    if kind == "linear":
        return arr.T
    return arr


def load_torch_state(path: str) -> Dict[str, Any]:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model_state_dict", "dist_state_dict", "state_dict"):
        if isinstance(state, dict) and key in state:
            state = state[key]
            break
    # strip DataParallel prefixes
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in state.items()}


def set_in(tree: dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node[p]
    leaf = node[path[-1]]
    if hasattr(leaf, "shape") and tuple(leaf.shape) != tuple(value.shape):
        raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                         f"{leaf.shape} vs {value.shape}")
    node[path[-1]] = value.astype(np.asarray(leaf).dtype) \
        if hasattr(leaf, "dtype") else value


def apply_mapping(variables: dict, state: Dict[str, Any],
                  mapping: Dict[Tuple[str, ...], Tuple[str, str]],
                  strict: bool = True) -> dict:
    import jax

    out = jax.tree_util.tree_map(lambda x: np.asarray(x), variables)
    missing = []
    for flax_path, (torch_key, kind) in mapping.items():
        if torch_key not in state:
            missing.append(torch_key)
            continue
        set_in(out, flax_path, _transform(kind, _to_numpy(state[torch_key])))
    if missing and strict:
        raise KeyError(f"torch keys missing from checkpoint: {missing[:10]} "
                       f"(+{max(0, len(missing)-10)} more)")
    return out


# --------------------------------------------------------------------------
# per-model mappings
# --------------------------------------------------------------------------

def _conv(flax_prefix, torch_prefix, kind="conv2d", bias=True):
    m = {flax_prefix + ("kernel",): (torch_prefix + ".weight", kind)}
    if bias:
        m[flax_prefix + ("bias",)] = (torch_prefix + ".bias", "raw")
    return m


def _linear(flax_prefix, torch_prefix, bias=True):
    m = {flax_prefix + ("kernel",): (torch_prefix + ".weight", "linear")}
    if bias:
        m[flax_prefix + ("bias",)] = (torch_prefix + ".bias", "raw")
    return m


def _layernorm(flax_prefix, torch_prefix):
    return {flax_prefix + ("scale",): (torch_prefix + ".weight", "raw"),
            flax_prefix + ("bias",): (torch_prefix + ".bias", "raw")}


def raft_mapping(has_batch_stats: bool = True):
    """RAFT/raft.py tree -> fgt_tpu.models.raft paths."""
    P = ("params",)
    S = ("batch_stats",)
    m: dict = {}

    def encoder(name, norm):
        mm = {}
        mm.update(_conv(P + (name, "conv1"), f"{name}.conv1"))
        mm.update(_conv(P + (name, "conv2"), f"{name}.conv2"))
        if norm == "batch":
            mm.update({
                P + (name, "norm1", "BatchNorm_0", "scale"): (f"{name}.norm1.weight", "raw"),
                P + (name, "norm1", "BatchNorm_0", "bias"): (f"{name}.norm1.bias", "raw"),
                S + (name, "norm1", "BatchNorm_0", "mean"): (f"{name}.norm1.running_mean", "raw"),
                S + (name, "norm1", "BatchNorm_0", "var"): (f"{name}.norm1.running_var", "raw"),
            })
        for i in range(3):
            for j in range(2):
                blk = P + (name, f"layer{i}_{j}")
                tblk = f"{name}.layer{i+1}.{j}"
                mm.update(_conv(blk + ("conv1",), tblk + ".conv1"))
                mm.update(_conv(blk + ("conv2",), tblk + ".conv2"))
                if norm == "batch":
                    for nidx in ("norm1", "norm2"):
                        mm.update({
                            blk + (nidx, "BatchNorm_0", "scale"): (f"{tblk}.{nidx}.weight", "raw"),
                            blk + (nidx, "BatchNorm_0", "bias"): (f"{tblk}.{nidx}.bias", "raw"),
                        })
                        mm.update({
                            S + (name, f"layer{i}_{j}", nidx, "BatchNorm_0", "mean"): (f"{tblk}.{nidx}.running_mean", "raw"),
                            S + (name, f"layer{i}_{j}", nidx, "BatchNorm_0", "var"): (f"{tblk}.{nidx}.running_var", "raw"),
                        })
                if i > 0 and j == 0:  # strided block has downsample
                    mm.update(_conv(blk + ("downsample",), tblk + ".downsample.0"))
                    if norm == "batch":
                        mm.update({
                            blk + ("norm3", "BatchNorm_0", "scale"): (f"{tblk}.norm3.weight", "raw"),
                            blk + ("norm3", "BatchNorm_0", "bias"): (f"{tblk}.norm3.bias", "raw"),
                        })
                        mm.update({
                            S + (name, f"layer{i}_{j}", "norm3", "BatchNorm_0", "mean"): (f"{tblk}.norm3.running_mean", "raw"),
                            S + (name, f"layer{i}_{j}", "norm3", "BatchNorm_0", "var"): (f"{tblk}.norm3.running_var", "raw"),
                        })
        return mm

    m.update(encoder("fnet", "instance"))
    m.update(encoder("cnet", "batch"))

    ub = P + ("update_block",)
    for c in ("convc1", "convc2", "convf1", "convf2", "conv"):
        m.update(_conv(ub + ("encoder", c), f"update_block.encoder.{c}"))
    for ours, theirs in (("convz_h", "convz1"), ("convr_h", "convr1"),
                         ("convq_h", "convq1"), ("convz_v", "convz2"),
                         ("convr_v", "convr2"), ("convq_v", "convq2")):
        m.update(_conv(ub + ("gru", ours), f"update_block.gru.{theirs}"))
    m.update(_conv(ub + ("flow_conv1",), "update_block.flow_head.conv1"))
    m.update(_conv(ub + ("flow_conv2",), "update_block.flow_head.conv2"))
    m.update(_conv(ub + ("mask_conv1",), "update_block.mask.0"))
    m.update(_conv(ub + ("mask_conv2",), "update_block.mask.2"))
    return m


def raft_small_mapping():
    """RAFT --small tree (SmallEncoder bottlenecks + plain ConvGRU +
    FlowHead; reference raft.py:48-51, extractor.py:195-266,
    update.py:62-112). Instance/none norms carry no parameters."""
    P = ("params",)
    m: dict = {}
    for name in ("fnet", "cnet"):
        m.update(_conv(P + (name, "conv1"), f"{name}.conv1"))
        m.update(_conv(P + (name, "conv2"), f"{name}.conv2"))
        for i in range(3):
            for j in range(2):
                blk = P + (name, f"layer{i}_{j}")
                tblk = f"{name}.layer{i + 1}.{j}"
                for c in ("conv1", "conv2", "conv3"):
                    m.update(_conv(blk + (c,), f"{tblk}.{c}"))
                if i > 0 and j == 0:
                    m.update(_conv(blk + ("downsample",),
                                   f"{tblk}.downsample.0"))
    ub = P + ("update_block",)
    for c in ("convc1", "convf1", "convf2", "conv"):
        m.update(_conv(ub + ("encoder", c), f"update_block.encoder.{c}"))
    for g in ("convz", "convr", "convq"):
        m.update(_conv(ub + ("gru", g), f"update_block.gru.{g}"))
    m.update(_conv(ub + ("flow_conv1",), "update_block.flow_head.conv1"))
    m.update(_conv(ub + ("flow_conv2",), "update_block.flow_head.conv2"))
    return m


def convert_raft_checkpoint(path: str, variables: dict,
                            small: bool = False) -> dict:
    state = load_torch_state(path)
    mapping = raft_small_mapping() if small else raft_mapping()
    return apply_mapping(variables, state, mapping)


# ---------------- LAFC ----------------

def _vanilla(flax_prefix, torch_prefix, kind="conv2d", bias=True,
             conv_name="conv"):
    """A VanillaConv block: our <prefix>/<conv_name>/kernel <- featureConv."""
    return _conv(flax_prefix + (conv_name,), torch_prefix + ".featureConv",
                 kind, bias)


def lafc_mapping(res_blocks: int = 1):
    P = ("params", "net")
    m: dict = {}

    def p3d(ours, theirs):
        mm = {}
        mm.update(_vanilla(P + (ours, "conv1"), theirs + ".conv1", "conv3d"))
        mm.update(_vanilla(P + (ours, "conv2"), theirs + ".conv2", "conv3d"))
        return mm

    m.update(p3d("enc2_block0", "net.encoder2.1"))
    m.update(p3d("enc2_block1", "net.encoder2.2"))
    m.update(p3d("enc4_block0", "net.encoder4.0"))
    m.update(p3d("enc4_block1", "net.encoder4.1"))
    for i in range(res_blocks):
        m.update(p3d(f"res{i}", f"net.res_blocks.{i}"))
    for c in ("condense2", "condense4_pre", "condense4_post"):
        m.update(_vanilla(P + (c,), f"net.{c}", "conv3d"))
    for i in range(4):
        m.update(_vanilla(P + (f"middle{i}",), f"net.middle.{i}"))
    m.update(_conv(P + ("dec2_deconv", "conv", "conv"),
                   "net.decoder2.0.conv.featureConv"))
    m.update(_vanilla(P + ("dec2_conv0",), "net.decoder2.1"))
    m.update(_vanilla(P + ("dec2_conv1",), "net.decoder2.2"))
    m.update(_conv(P + ("dec_deconv", "conv", "conv"),
                   "net.decoder.0.conv.featureConv"))
    m.update(_vanilla(P + ("dec_conv0",), "net.decoder.1"))
    m.update(_vanilla(P + ("dec_conv1",), "net.decoder.2"))
    for ours, theirs in (("projection", "projection"), ("mid1", "mid_layer_1"),
                         ("mid2", "mid_layer_2"), ("out", "out_layer")):
        m.update(_vanilla(P + ("edge_detector", ours),
                          f"net.edgeDetector.{theirs}"))
    return m


def convert_lafc_checkpoint(path: str, variables: dict,
                            res_blocks: int = 1) -> dict:
    return apply_mapping(variables, load_torch_state(path),
                         lafc_mapping(res_blocks))


def lafc_single_mapping(res_blocks: int = 1):
    P = ("params", "net")
    m: dict = {}
    m.update(_vanilla(P + ("enc2_conv0",), "net.encoder2.1"))
    m.update(_vanilla(P + ("enc2_conv1",), "net.encoder2.2"))
    m.update(_vanilla(P + ("enc4_conv0",), "net.encoder4.0"))
    m.update(_vanilla(P + ("enc4_conv1",), "net.encoder4.1"))
    for i in range(res_blocks):
        m.update(_conv(P + (f"res{i}", "conv1"), f"net.res_blocks.{i}.conv1"))
        m.update(_conv(P + (f"res{i}", "conv2"), f"net.res_blocks.{i}.conv2"))
    for i in range(4):
        m.update(_vanilla(P + (f"middle{i}",), f"net.middle.{i}"))
    m.update(_conv(P + ("dec2_deconv", "conv", "conv"),
                   "net.decoder2.0.conv.featureConv"))
    m.update(_vanilla(P + ("dec2_conv0",), "net.decoder2.1"))
    m.update(_vanilla(P + ("dec2_conv1",), "net.decoder2.2"))
    m.update(_conv(P + ("dec_deconv", "conv", "conv"),
                   "net.decoder.0.conv.featureConv"))
    m.update(_vanilla(P + ("dec_conv0",), "net.decoder.1"))
    m.update(_vanilla(P + ("dec_conv1",), "net.decoder.2"))
    for ours, theirs in (("projection", "projection"), ("mid1", "mid_layer_1"),
                         ("mid2", "mid_layer_2"), ("out", "out_layer")):
        m.update(_vanilla(P + ("edge_detector", ours),
                          f"net.edgeDetector.{theirs}"))
    return m


def convert_lafc_single_checkpoint(path: str, variables: dict,
                                   res_blocks: int = 1) -> dict:
    return apply_mapping(variables, load_torch_state(path),
                         lafc_single_mapping(res_blocks))


# ---------------- FGT ----------------

def _transformer_t(flax_prefix, torch_prefix):
    m = {}
    att = flax_prefix + ("attention",)
    for ours, theirs in (("query", "query_embedding"), ("key", "key_embedding"),
                         ("value", "value_embedding"), ("out", "output_linear")):
        m.update(_linear(att + (ours,), f"{torch_prefix}.attention.{theirs}"))
    m.update(_layernorm(flax_prefix + ("norm1",), f"{torch_prefix}.norm1"))
    m.update(_layernorm(flax_prefix + ("norm2",), f"{torch_prefix}.norm2"))
    m.update(_linear(flax_prefix + ("ffn", "conv1"), f"{torch_prefix}.ffn.conv1"))
    m.update(_linear(flax_prefix + ("ffn", "conv2"), f"{torch_prefix}.ffn.conv2.2"))
    return m


def _transformer_s(flax_prefix, torch_prefix):
    m = {}
    att = flax_prefix + ("attention",)
    for ours, theirs in (("query", "query_embedding"), ("key", "key_embedding"),
                         ("value", "value_embedding"), ("out", "output_linear")):
        m.update(_linear(att + (ours,), f"{torch_prefix}.attention.{theirs}"))
    m.update(_linear(att + ("reweight",),
                     f"{torch_prefix}.attention.reweightFlow.0"))
    for nm in ("q_norm", "k_norm", "v_norm"):
        m.update(_layernorm(att + (nm,), f"{torch_prefix}.attention.{nm}"))
    m.update(_conv(att + ("global_k", "conv"),
                   f"{torch_prefix}.attention.global_extract_k", "dwconv2d"))
    m.update(_conv(att + ("global_v", "conv"),
                   f"{torch_prefix}.attention.global_extract_v", "dwconv2d"))
    m.update(_layernorm(flax_prefix + ("norm",), f"{torch_prefix}.norm"))
    m.update(_linear(flax_prefix + ("ffn", "conv1"), f"{torch_prefix}.ffn.conv1"))
    m.update(_linear(flax_prefix + ("ffn", "conv2"), f"{torch_prefix}.ffn.conv2.2"))
    return m


def fgt_mapping(num_blocks: int = 8):
    P = ("params", "net")
    m: dict = {}
    for i in range(9):
        m.update(_conv(P + ("frame_encoder", f"conv{i}"),
                       f"net.frame_endoder.layers.{2*i}"))
    for i in range(4):
        m.update(_vanilla(P + ("flow_encoder", f"block{i}"),
                          f"net.flow_encoder.{i+1}"))
    m.update(_conv(P + ("patch2vec",), "net.patch2vec"))
    m.update(_conv(P + ("f_patch2vec",), "net.f_patch2vec"))
    m.update(_conv(P + ("add_pos_emb", "proj"), "net.add_pos_emb.proj",
                   "dwconv2d"))
    m.update(_transformer_t(P + ("first_t_transformer",),
                            "net.first_t_transformer"))
    m.update(_transformer_s(P + ("first_s_transformer",),
                            "net.first_s_transformer"))
    for i in range(num_blocks // 2 - 1):
        m.update(_transformer_t(P + (f"block{i}_t",),
                                f"net.transformer.{i}.t_transformer"))
        m.update(_transformer_s(P + (f"block{i}_s",),
                                f"net.transformer.{i}.s_transformer"))
    m.update(_linear(P + ("vec2patch", "embedding"), "net.vec2patch.embedding"))
    m.update(_conv(P + ("decoder", "layer1", "conv", "conv"),
                   "net.decoder.layer1.conv.featureConv"))
    m.update(_vanilla(P + ("decoder", "layer2"), "net.decoder.layer2"))
    m.update(_conv(P + ("decoder", "layer3", "conv", "conv"),
                   "net.decoder.layer3.conv.featureConv"))
    m.update(_vanilla(P + ("decoder", "final"), "net.decoder.final"))
    return m


def convert_fgt_checkpoint(path: str, variables: dict,
                           num_blocks: int = 8) -> dict:
    return apply_mapping(variables, load_torch_state(path),
                         fgt_mapping(num_blocks))


# ---------------- discriminator ----------------

def discriminator_mapping():
    P = ("params",)
    S = ("spectral",)
    m: dict = {}
    for i in range(5):
        m[P + (f"conv{i}", "kernel")] = (f"conv.{2*i}.weight_orig", "conv3d")
        m[S + (f"conv{i}", "u")] = (f"conv.{2*i}.weight_u", "raw")
    m.update(_conv(P + ("conv5",), "conv.10", "conv3d"))
    return m


def convert_discriminator_state(state: Dict[str, Any], variables: dict) -> dict:
    out = apply_mapping(variables, state, discriminator_mapping())
    # torch flattens OIDHW kernels as (O, I*D*H*W) for the power iteration;
    # our DHWIO kernels flatten as (O, D*H*W*I) — permute v accordingly.
    for i in range(5):
        w = _to_numpy(state[f"conv.{2*i}.weight_orig"])  # (O, I, D, H, W)
        v = _to_numpy(state[f"conv.{2*i}.weight_v"])
        _, I, D, H, W = w.shape
        v = v.reshape(I, D, H, W).transpose(1, 2, 3, 0).reshape(-1)
        set_in(out, ("spectral", f"conv{i}", "v"), v)
    return out


def convert_discriminator_checkpoint(path: str, variables: dict) -> dict:
    return convert_discriminator_state(load_torch_state(path), variables)
