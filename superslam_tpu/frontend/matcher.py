"""LightGlue matcher backend implementing the core FeatureMatcher interface.

TPU counterpart of the reference wrapper (``/root/reference/src/LightGlue.cc``):
- **Device path** (live tracking): both feature sets are PaddedFeatures whose
  descriptors already live in HBM — the jitted matcher consumes them
  directly (the reference needs D2D copies from pool slots into engine
  bindings, ``src/LightGlue.cc:425-441``; here there is nothing to copy).
- **Host path** (loop closure): numpy descriptor rows from the keyframe
  database are padded to the static K and uploaded.
- Keypoints are normalized wrapper-side as (kpt - size/2)/(max(w,h)/2)
  (``src/LightGlue.cc:163-172``); the engine-visible output contract is
  matches0 [K] int32 (-1 = unmatched) + mscores0, postprocessed to index
  pairs exactly like ``postprocess_outputs`` (``src/LightGlue.cc:326-363``).

One compiled program serves every frame: inputs are always (K, 2)/(K, D)
with masks, so per-frame keypoint-count changes never recompile (the
reference re-allocates TRT bindings per frame instead).
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax.numpy as jnp

from ..core.interfaces import MatchResult
from ..models.lightglue import lightglue_match
from ..utils.profiler import profile_scope
from .features import PaddedFeatures, host_descriptors


class LightGlueMatcher:
    def __init__(
        self,
        params,
        image_width: int,
        image_height: int,
        max_keypoints: int = 1024,
        threshold: float = 0.1,
        descriptor_dim: int = 256,
    ):
        from ..ops.pallas.lightglue_layer import augment_fused_layer_params

        self.params = augment_fused_layer_params(params)
        self.image_width = float(image_width)
        self.image_height = float(image_height)
        self.capacity = int(max_keypoints)
        self.threshold = float(threshold)
        self.descriptor_dim = int(descriptor_dim)
        scale = max(self.image_width, self.image_height) / 2.0
        self._center = np.array(
            [self.image_width / 2.0, self.image_height / 2.0], np.float32
        )
        self._scale = np.float32(scale)

    # -- input coercion -------------------------------------------------------
    def _coerce(self, kp: np.ndarray, d: Any) -> tuple[jnp.ndarray, jnp.ndarray, int]:
        """-> (kpts (1,K,2) normalized, desc (1,K,D), n_valid)."""
        K = self.capacity
        if isinstance(d, PaddedFeatures):
            n = min(d.n, K)
            kpts = (d.kpts - self._center) / self._scale
            if d.kpts.shape[0] != K:
                raise ValueError(
                    f"PaddedFeatures capacity {d.kpts.shape[0]} != matcher K {K}"
                )
            return kpts[None], d.desc[None], n
        # Host path: numpy rows.
        kp = np.asarray(kp, np.float32).reshape(-1, 2)
        dh = host_descriptors(d) if not isinstance(d, np.ndarray) else d
        dh = np.asarray(dh, np.float32)
        n = min(kp.shape[0], dh.shape[0], K)
        kpad = np.zeros((K, 2), np.float32)
        dpad = np.zeros((K, self.descriptor_dim), np.float32)
        kpad[:n] = (kp[:n] - self._center) / self._scale
        dpad[:n] = dh[:n]
        return jnp.asarray(kpad)[None], jnp.asarray(dpad)[None], n

    @staticmethod
    def _mask(n: int, K: int) -> jnp.ndarray:
        return jnp.asarray((np.arange(K) < n)[None])

    # -- FeatureMatcher interface ---------------------------------------------
    def match(self, kp0, d0, kp1, d1) -> MatchResult:
        with profile_scope("lg_match"):
            k0, dd0, n0 = self._coerce(kp0, d0)
            k1, dd1, n1 = self._coerce(kp1, d1)
            K = self.capacity
            matches0, mscores0 = lightglue_match(
                self.params,
                k0,
                dd0,
                k1,
                dd1,
                self._mask(n0, K),
                self._mask(n1, K),
                threshold=self.threshold,
            )
            m = np.asarray(matches0[0])
            s = np.asarray(mscores0[0])
        # Filter -1 entries into (query, train) pairs (postprocess_outputs).
        qi = np.flatnonzero(m >= 0).astype(np.int32)
        return MatchResult(
            matches=np.stack([qi, m[qi].astype(np.int32)], axis=1),
            scores=s[qi].astype(np.float32),
        )

    def descriptors_to_host(self, d: Any) -> np.ndarray:
        return host_descriptors(d)

    def retain_for_matching(self, feats: Any) -> Any:
        """Keyframe-record form of a frame's descriptors.

        Device-backed features stay ON DEVICE: the loop verifier's
        ``match`` consumes PaddedFeatures HBM buffers directly, so keeping
        the record device-resident removes both the per-keyframe D2H
        (~0.6 MB) and the re-upload every geometric verification would
        otherwise pay on this bandwidth-bound host link. Batched program
        outputs are materialized into standalone per-frame buffers so the
        record never retains a whole (S, K, D) block. Host inputs fall
        back to float32 rows (the reference's descriptors_to_host,
        src/LightGlue.cc:443-460)."""
        desc = getattr(feats, "desc", None)
        if desc is not None and not isinstance(desc, np.ndarray):
            return PaddedFeatures(
                kpts=feats.kpts,  # materializes the slot slice if batched
                desc=desc,
                n=feats.n,
                width=feats.width,
                height=feats.height,
                valid=feats.valid,
            )
        return host_descriptors(feats)
