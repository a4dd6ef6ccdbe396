"""Render-domain SuperPoint supervision from the sprite-world renderer.

The shapes-pretrained detector (train/synthetic_shapes.py) learns corners
but its descriptors collapse on the sprite-world evaluation renders (the
appearance statistics differ: dense small high-frequency patterns vs large
sparse primitives — measured within-image descriptor cosine 0.94 on renders
vs 0.67 on shapes). This module closes the domain gap the way the original
SuperPoint closed synthetic->real (homographic adaptation, reference model
export pipeline SURVEY §2 #25) — except better: the sprite world knows its
EXACT corner locations (eval/synthetic_sequence._sprite_texture records
them; render_view projects them through each sprite's analytic
texture->image homography with occlusion-aware visibility), so the
fine-tune uses exact supervision rather than detector-aggregated
pseudo-labels.

Training images are rendered at the SAME focal length as the evaluation
sequences (apparent feature scale is fx/z, independent of image size), so
the fine-tuned features see the test-time appearance scale.
"""

from __future__ import annotations

import numpy as np

from ..eval.synthetic_sequence import (
    SpriteWorld,
    make_room_world,
    random_interior_pose,
    render_view,
)
from ..geometry import StereoCalib
from .synthetic_shapes import compact_from_pair, pair_from_image


class RenderDomainSource:
    """A bank of sprite worlds + the evaluation camera's intrinsics;
    draws homographic training pairs from random interior viewpoints."""

    def __init__(
        self,
        rng: np.random.Generator,
        h: int,
        w: int,
        fx: float = 320.0,
        n_worlds: int = 4,
        n_sprites: int = 240,
    ) -> None:
        self.h, self.w = h, w
        self.calib = StereoCalib(
            fx=fx, fy=fx, cx=w / 2.0, cy=h / 2.0, baseline=0.3
        )
        self.worlds: list[SpriteWorld] = [
            make_room_world(rng, n_sprites=n_sprites) for _ in range(n_worlds)
        ]

    def labeled_image(
        self, rng: np.random.Generator
    ) -> tuple[np.ndarray, np.ndarray]:
        world = self.worlds[int(rng.integers(len(self.worlds)))]
        pose = random_interior_pose(rng)
        img, corners = render_view(
            world, pose, self.calib, self.h, self.w, rng, return_corners=True
        )
        return img, corners

    def training_pair(self, rng: np.random.Generator) -> dict[str, np.ndarray]:
        img, corners = self.labeled_image(rng)
        return pair_from_image(rng, img, corners)

    def compact_pair(self, rng: np.random.Generator) -> dict[str, np.ndarray]:
        return compact_from_pair(self.training_pair(rng))
