"""Data pipeline tests: synthetic YouTube-VOS-style tree -> datasets ->
sharded sampler -> loader batches with the exact shapes/ranges the train
steps consume."""

import os

import imageio.v2 as imageio
import numpy as np
import pytest

from fgt_tpu.core.flow_io import write_flow
from fgt_tpu.data import (DataLoader, FGTVideoDataset, LAFCFlowDataset,
                          LAFCSingleFlowDataset, ShardedSampler,
                          create_dataloader, create_dataset, load_name2len)

H, W = 48, 64
N_FRAMES = 10


@pytest.fixture(scope="module")
def data_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("yvos")
    frames = root / "frames"
    flows = root / "flows"
    rng = np.random.RandomState(0)
    for video in ("video_a", "video_b"):
        fd = frames / video
        fd.mkdir(parents=True)
        for d in ("forward_flo", "backward_flo"):
            (flows / video / d).mkdir(parents=True)
        for i in range(N_FRAMES):
            img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
            imageio.imwrite(fd / f"{i:05d}.jpg", img)
            if i < N_FRAMES - 1:
                for d in ("forward_flo", "backward_flo"):
                    flow = rng.randn(H, W, 2).astype(np.float32)
                    write_flow(flow, str(flows / video / d / f"{i:05d}.flo"))
    return {"frame_path": str(frames), "flow_path": str(flows),
            "name2len": None,
            "flow": {"flow_height": H, "flow_width": W},
            "edge": {"sigma": 1, "low_threshold": 0.1,
                     "high_threshold": 0.2}}


def test_name2len_built_from_tree(data_tree):
    n2l = load_name2len(None, data_tree["frame_path"])
    assert n2l == {"video_a": N_FRAMES, "video_b": N_FRAMES}


def test_fgt_dataset_item(data_tree):
    opt = {"sample": "random", "input_resolution": (H, W), "num_frames": 5,
           "flow_direction": "for"}
    ds = FGTVideoDataset(opt, data_tree)
    assert len(ds) == 2
    item = ds[0]
    assert item["frames"].shape == (5, H, W, 3)
    assert item["masks"].shape == (5, H, W, 1)
    assert item["forward_flo"].shape == (5, H, W, 2)
    assert item["frames"].min() >= -1.0 and item["frames"].max() <= 1.0
    assert set(np.unique(item["masks"])) <= {0.0, 1.0}
    # holes are diffusion-filled, not zeroed
    m = item["masks"][0, :, :, 0] > 0
    if m.any():
        assert np.abs(item["forward_flo"][0][m]).sum() > 0


def test_fgt_dataset_seq_sampling_and_bi(data_tree):
    opt = {"sample": "seq", "input_resolution": (H, W), "num_frames": 5,
           "flow_direction": "bi"}
    item = FGTVideoDataset(opt, data_tree)[1]
    assert "forward_flo" in item and "backward_flo" in item


def test_lafc_dataset_item(data_tree):
    opt = {"sample": "seq", "num_flows": 3, "flow_interval": 3}
    ds = LAFCFlowDataset(opt, data_tree)
    item = ds[0]
    assert item["flows"].shape == (3, H, W, 2)
    assert item["diffused_flows"].shape == (3, H, W, 2)
    assert item["masks"].shape == (3, H, W, 1)
    assert item["current_frame"].shape == (H, W, 3)
    assert item["shift_frame"].shape == (H, W, 3)
    assert item["edges"].shape == (H, W, 1)
    assert 0.0 <= item["current_frame"].min() <= item["current_frame"].max() <= 1.0


def test_lafc_single_dataset_item(data_tree):
    ds = LAFCSingleFlowDataset({}, data_tree)
    item = ds[0]
    assert item["flows"].shape == (H, W, 2)
    assert item["diffused_flows"].shape == (H, W, 2)
    assert item["edges"].shape == (H, W, 1)


def test_sharded_sampler_partition():
    samplers = [ShardedSampler(10, shard=s, num_shards=4, shuffle=True,
                               seed=3) for s in range(4)]
    all_idx = []
    for s in samplers:
        s.set_epoch(2)
        idx = list(s)
        assert len(idx) == 3  # ceil(10/4) padded
        all_idx.extend(idx)
    assert set(all_idx) == set(range(10))
    # same epoch -> same order; different epoch -> different order
    samplers[0].set_epoch(2)
    a = list(samplers[0])
    samplers[0].set_epoch(3)
    b = list(samplers[0])
    assert a != b


def test_loader_inline_and_factory(data_tree):
    opt = {"sample": "random", "input_resolution": (H, W), "num_frames": 5,
           "flow_direction": "for"}
    ds = create_dataset(opt, data_tree, "train", "train_dataset")
    loader = create_dataloader("train", ds,
                               {"n_workers": 0, "batch_size": 2}, {"seed": 0})
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0]["frames"].shape == (2, 5, H, W, 3)


def test_loader_multiprocess(data_tree):
    opt = {"sample": "random", "input_resolution": (H, W), "num_frames": 5,
           "flow_direction": "for"}
    ds = FGTVideoDataset(opt, data_tree)
    loader = DataLoader(ds, batch_size=1, num_workers=2, drop_last=False)
    batches = list(loader)
    loader.close()
    assert len(batches) == 2
    assert batches[0]["frames"].shape == (1, 5, H, W, 3)


def test_fgt_dataset_error_fallback(data_tree, tmp_path):
    """A broken video must fall back to item 0 (reference
    train_dataset.py:39-45)."""
    opt = {"sample": "random", "input_resolution": (H, W), "num_frames": 5,
           "flow_direction": "for"}
    ds = FGTVideoDataset(opt, data_tree)
    ds.train_list.append("missing_video")
    ds.name2len["missing_video"] = N_FRAMES
    item = ds[len(ds) - 1]
    assert item["frames"].shape == (5, H, W, 3)


def test_sharded_sampler_tiny_dataset_pads_by_tiling():
    """num_samples < num_shards must still give every shard len(sampler)
    items (torch DistributedSampler tiling semantics; advisor finding r1)."""
    samplers = [ShardedSampler(3, shard=s, num_shards=8, shuffle=False)
                for s in range(8)]
    lists = [list(s) for s in samplers]
    assert all(len(l) == len(samplers[0]) == 1 for l in lists)
    assert set(x for l in lists for x in l) == {0, 1, 2}

    samplers = [ShardedSampler(5, shard=s, num_shards=4, shuffle=True,
                               seed=3) for s in range(4)]
    lists = [list(s) for s in samplers]
    assert all(len(l) == 2 for l in lists)
    assert set(x for l in lists for x in l) == {0, 1, 2, 3, 4}


def test_frame_and_mask_readers(tmp_path):
    """FVI reader zoo: directory listing + sampling + bbox extraction +
    bbox-list mask generation (reference readers.py surface)."""
    import cv2

    from fgt_tpu.data.readers import (BoundingBoxesListReader,
                                      CompareFramesReader, FrameReader,
                                      MaskGenerator, MaskReader,
                                      save_frames_to_dir)

    d = tmp_path / "fr"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(6):
        cv2.imwrite(str(d / f"{i:05d}.png"),
                    rng.randint(0, 255, (24, 32, 3), np.uint8))
    r = FrameReader(str(d), max_length=4, sample_period=2)
    assert len(r) == 3  # 6 files, every 2nd, capped at 4
    assert r[0].shape == (24, 32, 3)
    r2 = FrameReader(str(d), resize=(16, 12))
    assert r2[0].shape == (12, 16, 3)

    md = tmp_path / "masks"
    md.mkdir()
    m = np.zeros((24, 32), np.uint8)
    m[5:15, 8:20] = 255
    cv2.imwrite(str(md / "00000.png"), m)
    mr = MaskReader(str(md))
    (x0, y0), (x1, y1) = mr.get_bbox(0)
    assert (x0, y0) == (8, 5) and (x1, y1) == (19, 14)

    gen = MaskGenerator(str(tmp_path / "gen"), (32, 24),
                        [[((8, 5), (19, 14))]], save_masks=True)
    np.testing.assert_array_equal(gen[0], m)
    assert (tmp_path / "gen" / "mask_0000.png").exists()

    cmp_r = CompareFramesReader([str(d), str(d)], names=["a", "b"])
    assert cmp_r[0].shape == (24, 64, 3)

    bd = tmp_path / "boxes"
    bd.mkdir()
    (bd / "b0.txt").write_text("8 5 19 14\n1 2 3 4\n")
    br = BoundingBoxesListReader(str(bd))
    assert br[0] == [((8, 5), (19, 14)), ((1, 2), (3, 4))]

    save_frames_to_dir([r[0]], str(tmp_path / "out_frames"))
    assert (tmp_path / "out_frames" / "frame_0000.png").exists()


def test_mask_models_shapes_and_reproducibility():
    """Mask-model zoo (reference MaskModel.py surface): [T,H,W,1] masks,
    255=hole, seeded reproducibility."""
    from fgt_tpu.data.mask_models import MASK_MODELS, build_mask_model

    info = {"image": {"image_height": 48, "image_width": 64},
            "mask": {"mask_height": 16, "mask_width": 20,
                     "vertical_margin": 2, "horizontal_margin": 2,
                     "row": 2, "column": 2}}
    for name in MASK_MODELS:
        model = build_mask_model(name, 4, info, seed=3)
        masks = model()
        assert masks.shape == (4, 48, 64, 1), name
        assert set(np.unique(masks)) <= {0.0, 255.0}, name
        assert masks.sum() > 0, name
    a = build_mask_model("random", 4, info, seed=3)()
    b = build_mask_model("random", 4, info, seed=3)()
    np.testing.assert_array_equal(a, b)
