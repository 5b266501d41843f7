"""Data pipeline: synth H5 schema, windowing, blur synthesis, loader."""
import os

import numpy as np
import pytest

from ebfi_tpu.data.synth import write_clip_h5
from ebfi_tpu.data.h5dataset import (
    H5ClipDataset,
    H5ClipDatasetReal,
    ScaleSpec,
    compute_period_windows,
    compute_seq_windows,
)
from ebfi_tpu.data.dataloader import EBFIDataLoader, read_datalist, collate


def dataset_cfg(**kw):
    cfg = dict(
        scale=1,
        ori_scale="ori",
        time_bins=4,
        NumFramePerPeriod=8,
        NumFramePerBlurry=8,
        NumPeriodPerSeq=2,
        SlidingWindowSeq=2,
        NumPeriodPerLoad=1,
        SlidingWindowLoad=1,
        ExposureMethod="Custom",
        ExposureTime=[3, 5, 7],
        data_augment=dict(
            enabled=False,
            augment=["RandomCrop", "CenterCrop", "HorizontalFlip", "VertivcalFlip", "Noise", "HotPixel"],
            random_crop=dict(enabled=False, size=[32, 32]),
            center_crop=dict(enabled=False, size=[32, 32]),
            flip=dict(enabled=False, horizontal_prob=0.5, vertical_prob=0.5),
            noise=dict(enabled=False, noise_std=1.0, noise_fraction=0.05),
            hot_pixel=dict(enabled=False, hot_pixel_std=2.0, hot_pixel_fraction=0.001),
        ),
    )
    cfg.update(kw)
    return cfg


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("h5") / "clip.h5")
    write_clip_h5(path, num_frames=48, H=48, W=64, seed=3)
    return path


@pytest.fixture(scope="module")
def real_clip(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("h5r") / "real.h5")
    write_clip_h5(path, num_frames=24, H=48, W=64, seed=5, real_exposure=(0.6, 0.1))
    return path


def test_scale_spec():
    s = ScaleSpec.resolve((720, 1280), 2, "down2")
    assert s.gt_prefix == "ori" and s.inp_prefix == "down2"
    assert s.gt_resolution == (720, 1280) and s.inp_resolution == (360, 640)
    s2 = ScaleSpec.resolve((720, 1280), 2, "down4")
    assert s2.gt_prefix == "down2" and s2.gt_resolution == (360, 640)
    with pytest.raises(ValueError):
        ScaleSpec.resolve((720, 1280), 3, "down2")


def test_period_windows_custom():
    periods, latents, blurries, duty = compute_period_windows(
        48, 8, 8, "Custom", [3, 5, 7]
    )
    assert len(periods) == 5  # arange(0,48,8)[:-1]
    assert latents[0] == list(range(8))
    assert blurries[0] == [0, 1, 2] and duty[0] == 3 / 8
    assert blurries[1] == list(range(8, 13)) and duty[1] == 5 / 8
    assert blurries[3] == [24, 25, 26]  # cycles through ExposureTime


def test_seq_windows():
    seqs = compute_seq_windows(5, 2, 2, 1, 1)
    assert seqs == [[(0, 0), (1, 1)], [(2, 2), (3, 3)]]


def test_item_shapes_and_blur_synthesis(clip):
    ds = H5ClipDataset(clip, dataset_cfg())
    assert len(ds) == 2
    item = ds.get(0, seed=7)
    L, NumP, NumF = 2, 1, 8
    assert item["latent"].shape == (L, NumP, NumF, 48, 64, 3)
    assert item["blurry"].shape == (L, NumP, 48, 64, 3)
    assert item["events"].shape == (L, 48, 64, 8)  # 2*TB
    assert item["relative_ts"].shape == (L, NumP, NumF)
    assert item["exposure"].shape == (L, NumP, 1)
    # first period blur == mean of first 3 latent frames (ExposureTime[0]=3)
    np.testing.assert_allclose(
        item["blurry"][0, 0],
        item["latent"][0, 0, :3].mean(0),
        atol=1e-6,
    )
    assert item["exposure"][0, 0, 0] == pytest.approx(3 / 8)
    # timestamps normalized by the load interval
    np.testing.assert_allclose(item["latent_ts"][0], np.arange(8) / 8)


def test_augment_crop_flip_joint(clip):
    cfg = dataset_cfg()
    cfg["data_augment"]["enabled"] = True
    cfg["data_augment"]["random_crop"] = dict(enabled=True, size=[32, 32])
    cfg["data_augment"]["flip"] = dict(enabled=True, horizontal_prob=1.0, vertical_prob=0.0)
    ds = H5ClipDataset(clip, cfg)
    item = ds.get(0, seed=11)
    assert item["latent"].shape[-3:-1] == (32, 32)
    assert item["events"].shape[-3:-1] == (32, 32)
    # same seed -> identical crops (blur stays the mean of latents)
    np.testing.assert_allclose(
        item["blurry"][0, 0], item["latent"][0, 0, :3].mean(0), atol=1e-6
    )
    # different seed -> different crop almost surely
    item2 = ds.get(0, seed=12)
    assert not np.allclose(item["blurry"], item2["blurry"])


def test_real_dataset(real_clip):
    cfg = dataset_cfg(interp_num=5)
    ds = H5ClipDatasetReal(real_clip, cfg)
    item = ds.get(0)
    L, NumP = 2, 1
    assert item["blurry"].shape == (L, NumP, 48, 64, 3)
    assert item["events"].shape == (L, 48, 64, 8)
    np.testing.assert_allclose(item["relative_ts"][0, 0], np.linspace(0, 1, 5))
    duty = item["exposure"]
    assert np.all(duty > 0.3) and np.all(duty < 0.9)  # 0.6 +- 10% jitter


def test_loader_shard_batch(clip, tmp_path):
    lst = tmp_path / "list.txt"
    lst.write_text(f"{clip}\n{clip}\n")
    loader = EBFIDataLoader(
        str(lst), dataset_cfg(), batch_size=2, shuffle=True, drop_last=True, seed=1
    )
    assert len(read_datalist(str(lst))) == 2
    assert len(loader) == 2  # 4 items / batch 2
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["blurry"].shape[0] == 2

    # two disjoint shards cover the epoch
    sh0 = EBFIDataLoader(str(lst), dataset_cfg(), batch_size=1, shard_index=0, num_shards=2)
    sh1 = EBFIDataLoader(str(lst), dataset_cfg(), batch_size=1, shard_index=1, num_shards=2)
    assert len(sh0) + len(sh1) == 4

    # set_epoch reshuffles
    loader.set_epoch(0)
    o0 = loader._shard_order()
    loader.set_epoch(1)
    o1 = loader._shard_order()
    assert o0 != o1


# ----------------------------------------------------------------- #
# ESIM-lite simulator fidelity (reference: generate_dataset/syn_gopro.py)


def test_esim_per_polarity_thresholds_shift_ratio():
    """Raising Cn while holding Cp must suppress negative events: the
    neg/pos count ratio strictly decreases (syn_gopro.py:104-118 draws Cp
    and Cn independently, so the two polarities have distinct rates)."""
    from ebfi_tpu.data.synth import render_frames, simulate_events

    frames = render_frames(24, 32, 40, seed=5, speed=3.0)
    ts = np.arange(24) / 240.0

    def ratio(cp, cn):
        (xs, ys, ets, ps), _ = simulate_events(frames, ts, cp=cp, cn=cn)
        pos, neg = int((ps > 0).sum()), int((ps < 0).sum())
        assert pos > 0 and neg > 0
        return neg / pos

    r_sym = ratio(0.2, 0.2)
    r_hi = ratio(0.2, 0.4)
    assert r_hi < r_sym * 0.75


def test_esim_refractory_caps_per_pixel_rate():
    """With a refractory period, every pixel's emitted events are spaced
    by more than the period (esim_py semantics; reference config uses
    refractory_period=1e-4, syn_gopro.py:17)."""
    from ebfi_tpu.data.synth import render_frames, simulate_events

    frames = render_frames(24, 32, 40, seed=6, speed=4.0)
    ts = np.arange(24) / 240.0
    refr = 2e-3  # half a frame interval, well above the timestamp jitter

    (xs0, ys0, ts0, _), _ = simulate_events(frames, ts, cp=0.05, cn=0.05)
    (xs, ys, ets, _), _ = simulate_events(frames, ts, cp=0.05, cn=0.05,
                                          refractory_period=refr)
    assert len(ets) < len(ts0)  # suppression happened

    pix = (np.asarray(ys, np.int64) << 32) | np.asarray(xs, np.int64)
    order = np.lexsort((ets, pix))
    pix_s, ts_s = pix[order], ets[order]
    same = pix_s[1:] == pix_s[:-1]
    gaps = (ts_s[1:] - ts_s[:-1])[same]
    if len(gaps):
        assert gaps.min() > refr * 0.9


def test_esim_sample_thresholds_scheme():
    """Cp ~ U[range], Cn = gauss(mu, sigma)*Cp, both clamped to range."""
    from ebfi_tpu.data.synth import sample_thresholds

    rng = np.random.default_rng(0)
    lo, hi = 0.2, 0.5
    draws = [sample_thresholds(rng, (lo, hi)) for _ in range(500)]
    cps = np.array([d[0] for d in draws])
    cns = np.array([d[1] for d in draws])
    assert cps.min() >= lo and cps.max() <= hi
    assert cns.min() >= lo and cns.max() <= hi
    # mu=1, sigma=0.1 -> cn centred on cp (clamping skews only the tails)
    assert abs(np.mean(cns - cps)) < 0.02
    # mu=1.5 pushes cn above cp on average
    rng2 = np.random.default_rng(1)
    hi_draws = [sample_thresholds(rng2, (lo, hi), mu=1.5) for _ in range(200)]
    assert np.mean([d[1] - d[0] for d in hi_draws]) > 0.0


def test_loader_process_workers_match_threads(clip, tmp_path):
    """num_workers>0 (process fetch plane) yields bit-identical batches in
    the same order as the in-process path — incl. augmentation, whose
    per-item seeds are drawn in the main thread either way."""
    import random

    cfg = dataset_cfg(
        data_augment=dict(
            dataset_cfg()["data_augment"],
            enabled=True,
            random_crop=dict(enabled=True, size=[32, 32]),
            flip=dict(enabled=True, horizontal_prob=0.5, vertical_prob=0.5),
            noise=dict(enabled=True, noise_std=1.0, noise_fraction=0.05),
        )
    )
    random.seed(7)
    ref = list(EBFIDataLoader(clip, cfg, batch_size=2, shuffle=True, seed=3))
    random.seed(7)
    got = list(
        EBFIDataLoader(clip, cfg, batch_size=2, shuffle=True, seed=3, num_workers=2)
    )
    assert len(got) == len(ref) > 0
    for b_ref, b_got in zip(ref, got):
        assert set(b_ref) == set(b_got)
        for k in b_ref:
            np.testing.assert_array_equal(b_ref[k], b_got[k])
