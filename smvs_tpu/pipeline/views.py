"""Per-view image state for the stereo pipeline.

TPU-native counterpart of reference `lib/stereo_view.h/.cc`: caches the
float image, builds the scale-space (blur, NOT downsample — reference
`lib/stereo_view.cc:27-31`), its quadratic-fit gradients/Hessian, and the
linear (shading) image for the SH term.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from smvs_tpu.core.camera import Camera
from smvs_tpu.image import gradients as igrad
from smvs_tpu.image import ops as iops


@dataclasses.dataclass
class ScaleImages:
    image: jnp.ndarray  # blurred gray [H, W]
    grad: jnp.ndarray  # [2, H, W]
    hess: jnp.ndarray  # [3, H, W]


@dataclasses.dataclass
class StereoViewState:
    """One view: camera + image pyramids (by blur) + optional shading data."""

    camera: Camera
    image: jnp.ndarray  # gray float [H, W] in [0, 1]
    color: Optional[jnp.ndarray] = None  # [H, W, 3] if available
    view_id: int = 0
    gamma_correction: bool = False
    _scales: dict = dataclasses.field(default_factory=dict)
    _shading: Optional[tuple] = None

    @property
    def width(self) -> int:
        return self.image.shape[1]

    @property
    def height(self) -> int:
        return self.image.shape[0]

    def flen(self) -> float:
        return self.camera.flen_pixels(self.width, self.height)

    def at_scale(self, scale: int) -> ScaleImages:
        """Blur to the scale's sigma and differentiate

        (reference `StereoView::set_scale`, `lib/stereo_view.cc:24-46`).
        """
        if scale not in self._scales:
            blurred = iops.gaussian_blur(self.image,
                                         iops.scale_space_sigma(scale))
            grad, hess = igrad.gradients_and_hessian(blurred)
            self._scales[scale] = ScaleImages(blurred, grad, hess)
        return self._scales[scale]

    def shading_images(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(shading image [H, W], its gradients [2, H, W]).

        Linearized (inverse sRGB) luminance (reference
        `StereoView::initialize_linear`, `lib/stereo_view.cc:64-84`).
        """
        if self._shading is None:
            if self.color is not None:
                lin = self.color
                if self.gamma_correction:
                    lin = iops.srgb_to_linear(lin)
                shading = iops.luminance(lin)
            else:
                shading = (iops.srgb_to_linear(self.image)
                           if self.gamma_correction else self.image)
            grad, _ = igrad.gradients_and_hessian(shading)
            self._shading = (shading, grad)
        return self._shading


def make_view(camera: Camera, image: np.ndarray, view_id: int = 0,
              gamma_correction: bool = False, dtype=jnp.float32
              ) -> StereoViewState:
    img = np.asarray(image)
    color = None
    if img.ndim == 3:
        color = jnp.asarray(img, dtype=dtype)
        gray = iops.luminance(color)
    else:
        gray = jnp.asarray(img, dtype=dtype)
    return StereoViewState(camera=camera, image=gray, color=color,
                           view_id=view_id, gamma_correction=gamma_correction)
