"""Run the reference's OWN `infer_ours.py` CLI on CPU, under import shims.

Executed as a subprocess by tests/test_cli_parity.py (kept free of jax so
the reference's torch DataLoader fork-workers start from a clean process).

Usage:
  python ref_cli_driver.py --model_path ckpt.pth --data_list list.txt \
      --output_path outdir [extra infer_ours flags...]

Shims (everything the forward/metrics path computes is the reference's own
code):

- `kernelconv2d_cuda` / `_ext` module stubs (the vendored CUDA extensions;
  FAC's Function is replaced post-import with a CPU unfold evaluation of
  the exact kernel math, KernelConv2D_kernel.cu:25-53 — the same shim the
  model-parity tests use);
- `torchvision` / `open3d` / `thop` stubs (absent in this image; none are
  used by the synthetic-clip inference path);
- `skimage.metrics` reimplemented here from skimage's published algorithm
  (uniform-filter SSIM with border crop; PSNR = 10 log10(R^2/MSE); float
  inputs default to data_range 2.0 like classic skimage) — skimage is not
  installed in this image.  This shim is written independently of
  ebfi_tpu.losses, so PSNR/SSIM comparisons still check our metric stack
  against a separate implementation of the same published definition; the
  per-frame PNGs and MSE (pure torch nn.MSELoss) are entirely shim-free;
- `event_visualisation.plot_frame` is patched to a lossless cv2 PNG writer:
  the reference quantizes to uint8 *before* calling it (infer_ours.py:
  134-142), so the artifact's pixel values are fixed by reference code and
  only the encoder must be lossless (matplotlib's figure round-trip is
  not);
- `torch.Tensor.cuda` becomes a no-op (Frame2Lap/Frame2DCP end with
  `.cuda()`, myutils/utils.py:29,47);
- `perceptual_loss` is stubbed to return 0.0 — its alexnet backbone is
  downloaded at runtime by the reference (PerceptualSimilarity/models/
  pretrained_networks.py) and is unobtainable in-image for both repos; our
  CLI likewise omits non-comparable LPIPS values.
"""
import sys
import types

import numpy as np

REF_ROOT = "/root/reference"


def _fake_module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _install_skimage_shim():
    from scipy.ndimage import uniform_filter

    def peak_signal_noise_ratio(image_true, image_test, data_range=None):
        image_true = np.asarray(image_true, np.float64)
        image_test = np.asarray(image_test, np.float64)
        if data_range is None:
            data_range = 2.0  # classic skimage float dtype_range [-1, 1]
        err = np.mean((image_true - image_test) ** 2)
        return 10.0 * np.log10((float(data_range) ** 2) / err)

    def structural_similarity(im1, im2, win_size=7, data_range=None,
                              K1=0.01, K2=0.03):
        im1 = np.asarray(im1, np.float64)
        im2 = np.asarray(im2, np.float64)
        if data_range is None:
            data_range = 2.0
        npix = win_size ** im1.ndim
        cov_norm = npix / (npix - 1)
        filt = lambda x: uniform_filter(x, size=win_size)
        ux, uy = filt(im1), filt(im2)
        uxx, uyy, uxy = filt(im1 * im1), filt(im2 * im2), filt(im1 * im2)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        C1 = (K1 * data_range) ** 2
        C2 = (K2 * data_range) ** 2
        S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
            (ux ** 2 + uy ** 2 + C1) * (vx + vy + C2)
        )
        pad = (win_size - 1) // 2
        core = S[tuple(slice(pad, s - pad) for s in S.shape)]
        return core.mean()

    sk = _fake_module("skimage")
    skm = _fake_module(
        "skimage.metrics",
        structural_similarity=structural_similarity,
        peak_signal_noise_ratio=peak_signal_noise_ratio,
    )
    sk.metrics = skm
    # vendored LPIPS imports skimage.transform at module load
    # (PerceptualSimilarity/models/dist_model.py:16); never used on this
    # path (perceptual_loss itself is stubbed)
    sk.transform = _fake_module("skimage.transform")
    sk.color = _fake_module("skimage.color")  # networks_basic.py:11, unused


def _install_shims():
    import torch
    import torch.nn.functional as F

    sys.path.insert(0, REF_ROOT)

    # the reference pins the pre-3.6 matplotlib style name
    # 'seaborn-whitegrid' (matplotlib_plot_events.py:5); newer matplotlib
    # renamed it — tolerate the miss (style only affects figures we don't
    # compare)
    import matplotlib.pyplot as plt

    _orig_style_use = plt.style.use

    def _style_use(style, *a, **k):
        try:
            return _orig_style_use(style, *a, **k)
        except OSError:
            pass

    plt.style.use = _style_use

    _fake_module("thop", profile=lambda *a, **k: (0.0, 0.0))
    _fake_module("kernelconv2d_cuda")
    _fake_module("_ext")
    _fake_module("open3d")
    tv = _fake_module("torchvision")
    tvm = _fake_module("torchvision.models")
    tv.models = tvm
    tvm.resnet = _fake_module("torchvision.models.resnet", resnet34=None)
    tvm.utils = _fake_module("torchvision.models.utils",
                             load_state_dict_from_url=None)
    _install_skimage_shim()

    # .cuda() no-ops on this CPU-only run
    torch.Tensor.cuda = lambda self, *a, **kw: self
    torch.nn.Module.cuda = lambda self, *a, **kw: self

    import models.FAC.kernelconv2d.KernelConv2D as ref_kc

    class _CPUKernelConv2DFunction:
        """CPU twin of KernelConv2D_kernel.cu:25-53."""

        @staticmethod
        def apply(inp, kernel, k):
            B, Cc, Hp, Wp = inp.shape
            H, W = kernel.shape[2], kernel.shape[3]
            assert Hp - k == H - 1 and Wp - k == W - 1
            patches = F.unfold(inp, k).view(B, Cc * k * k, H, W)
            return (patches * kernel).view(B, Cc, k * k, H, W).sum(2)

    ref_kc.KernelConv2DFunction = _CPUKernelConv2DFunction


def main():
    _install_shims()

    import cv2
    import infer_ours

    # --exposure_time is declared type=str (infer_ours.py:211) but the
    # dataset indexes it like the YAML list the train path uses
    # (h5dataset.py:133,160-163) — a raw string crashes at the int
    # comparison, so the flag is unusable as shipped.  Parse "3,5" into the
    # list form the dataset expects (the minimal working interpretation).
    _orig_get_flags = infer_ours.get_flags

    def _get_flags():
        fl = _orig_get_flags()
        if fl.exposure_time is not None:
            fl.exposure_time = [
                int(x) for x in str(fl.exposure_time).strip("[]").split(",")
            ]
        return fl

    infer_ours.get_flags = _get_flags

    # Force num_workers=0: with forked workers each worker re-seeds python
    # `random`, so the per-item augmentation seeds (h5dataset.py:192-194)
    # depend on torch's worker scheduling; in-process loading makes the
    # seed sequence the deterministic one init_seeds(123) implies (bit-
    # reproducible noise for the noise-on parity configuration).
    for name in ("InferenceHDF5DataLoader", "InferenceHDF5DataLoaderRealData"):
        orig = getattr(infer_ours, name)

        def _nw0(data_path, config, _orig=orig):
            config = dict(config)
            config["num_workers"] = 0
            return _orig(data_path, config)

        setattr(infer_ours, name, _nw0)

    # the reference's pandas MetricTracker writes via `.values[:] = 0` and
    # `self._data.total[key] += ...` (myutils/utils.py:129-138) — both
    # disallowed by modern pandas copy-on-write.  Patch to .loc-based
    # equivalents with identical semantics.
    import myutils.utils as ref_utils

    def _mt_reset(self):
        for col in self._data.columns:
            self._data[col] = 0.0

    def _mt_update(self, key, value, n=1):
        if self.writer is not None:
            self.writer.add_scalar(key, value)
        self._data.loc[key, "total"] += value * n
        self._data.loc[key, "counts"] += n
        self._data.loc[key, "average"] = (
            self._data.loc[key, "total"] / self._data.loc[key, "counts"]
        )

    ref_utils.MetricTracker.reset = _mt_reset
    ref_utils.MetricTracker.update = _mt_update
    infer_ours.MetricTracker = ref_utils.MetricTracker
    from myutils.vis_events.matplotlib_plot_events import event_visualisation

    # lossless PNG writer (values already uint8-quantized by infer_ours)
    def plot_frame(self, frame, is_save, path=None, cmap="gray"):
        assert is_save and path is not None
        if frame.ndim == 3:
            cv2.imwrite(path, frame[:, :, ::-1])  # RGB -> BGR
        else:
            cv2.imwrite(path, frame)

    event_visualisation.plot_frame = plot_frame

    class _LpipsStub:
        def __call__(self, pred, target, normalize=True):
            import torch

            return torch.zeros(())

    infer_ours.perceptual_loss = lambda *a, **k: _LpipsStub()

    infer_ours.init_seeds(seed=123)
    infer_ours.main()


if __name__ == "__main__":
    main()
