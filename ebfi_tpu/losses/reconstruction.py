"""Self-supervised photometric-constancy reconstruction loss.

JAX port of `BrightnessConstancy` (loss/reconstruction.py:17-145,
"Back to Event Basics", Paredes-Valles et al., CVPR'21): three terms —

1. generative-model brightness-constancy error: L2 between the predicted
   brightness increment (warped image gradients . flow) and the event
   increment from the averaged IWE;
2. temporal consistency: L1 warping error between consecutive
   reconstructions;
3. total-variation image regularization.

Images are NHWC (B, H, W, 1); flow (B, H, W, 2) channel order (x, y).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.warp import grid_sample, sobel_gradients
from .flow import averaged_iwe


class BrightnessConstancy:
    def __init__(self, resolution: Tuple[int, int],
                 regul_weights: Sequence[float] = (0.1, 1.0)):
        self.res = resolution
        self.flow_scaling = max(resolution)
        self.weights = regul_weights
        H, W = resolution
        my, mx = np.mgrid[0:H, 0:W].astype(np.float32)
        self.grid_y = jnp.asarray(my)[None, :, :, None]
        self.grid_x = jnp.asarray(mx)[None, :, :, None]

    def _warp_grid(self, flow):
        H, W = self.res
        wy = self.grid_y - flow[..., 1:2] * self.flow_scaling
        wx = self.grid_x - flow[..., 0:1] * self.flow_scaling
        gy = 2.0 * wy / (H - 1) - 1.0
        gx = 2.0 * wx / (W - 1) - 1.0
        return jnp.concatenate([gx, gy], axis=-1)

    def generative_model(self, flow, img, event_cnt, event_list, pol_mask):
        """reconstruction.py:46-97."""
        flow_mask = (jnp.sum(event_cnt, axis=-1, keepdims=True) > 0).astype(flow.dtype)
        flow = flow * flow_mask
        grid = self._warp_grid(flow)
        gradx, grady = sobel_gradients(img)
        wx = grid_sample(gradx, grid)
        wy = grid_sample(grady, grid)
        pred_delta = (wx * flow[..., 0:1] + wy * flow[..., 1:2]) * self.flow_scaling

        avg = averaged_iwe(
            np.asarray(flow), np.asarray(event_list), np.asarray(pol_mask), self.res
        )
        event_delta = jnp.asarray(avg[:, 0] - avg[:, 1])[..., None]

        err = event_delta + pred_delta
        return jnp.sum(jnp.sum(err.reshape(err.shape[0], -1) ** 2, axis=1))

    def temporal_consistency(self, flow, prev_img, img):
        """reconstruction.py:99-131."""
        grid = self._warp_grid(flow)
        warped_prev = grid_sample(prev_img, grid)
        err = jnp.sum(jnp.abs(img - warped_prev))
        return self.weights[1] * err

    def regularization(self, img):
        """reconstruction.py:133-144 — forward-difference total variation."""
        dx = jnp.abs(img[:, :-1] - img[:, 1:]).sum()
        dy = jnp.abs(img[:, :, :-1] - img[:, :, 1:]).sum()
        return self.weights[0] * (dx + dy)
