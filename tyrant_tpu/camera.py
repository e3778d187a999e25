"""Camera model + fly controls.

Reference: camera.h/camera.cpp — a WASD+mouse fly camera whose direction is
derived from (horizontal, vertical) angles (camera.cpp:46-52), and the
projection basis lives in the frame orchestrator (kernel.cu:699-700:
``camera_right/up`` scaled by 1.5 and the aspect ratio).  Window-event
plumbing (GLFW polling) is replaced by a pure :meth:`Camera.move` /
:meth:`Camera.look` API the host viewer calls.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from .config import PI, RenderConfig


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CameraParams:
    """Device-side camera constants for one frame (the reference uploads
    these as kernel arguments, kernel.cu:719)."""

    position: jnp.ndarray   # [3]
    direction: jnp.ndarray  # [3]
    right: jnp.ndarray      # [3] includes 1.5 * aspect scale (kernel.cu:699)
    up: jnp.ndarray         # [3] includes 1.5 scale (kernel.cu:700)
    focal_distance: jnp.ndarray  # scalar
    lens_radius: jnp.ndarray     # scalar

    def tree_flatten(self):
        return ((self.position, self.direction, self.right, self.up,
                 self.focal_distance, self.lens_radius), None)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


@dataclasses.dataclass
class Camera:
    """Host-side interactive camera state (camera.h:3-22 defaults)."""

    position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([1.0, 30.0, 90.0], np.float32))
    up: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, 0.0, 1.0], np.float32))
    horizontal_angle: float = 0.0
    vertical_angle: float = 0.0
    focal_distance: float = 1.0
    lens_radius: float = 0.0

    @property
    def direction(self) -> np.ndarray:
        """Spherical -> cartesian.  Reference: camera.cpp:46-52."""
        cv, sv = math.cos(self.vertical_angle), math.sin(self.vertical_angle)
        ch, sh = math.cos(self.horizontal_angle), math.sin(self.horizontal_angle)
        d = np.array([cv * sh, cv * ch, sv], np.float32)
        return d / np.linalg.norm(d)

    def move(self, forward=0.0, strafe=0.0, vertical=0.0, delta=1.0,
             sprint=False):
        """WASD/space/ctrl movement.  Reference: camera.cpp:3-29 (shift = 40x)."""
        speed = (40.0 if sprint else 1.0) * delta
        d = self.direction
        disp = np.cross(d, self.up)
        disp = disp / np.linalg.norm(disp)
        self.position = (self.position + d * (forward * speed)
                         + disp * (strafe * speed)
                         + np.array([0, 0, vertical * speed], np.float32))

    def look(self, dx: float, dy: float):
        """Mouse look.  Reference: camera.cpp:31-43 (0.012 rad/px, pitch
        clamped to +-pi/2)."""
        self.horizontal_angle += dx * 0.012
        self.vertical_angle -= dy * 0.012
        self.vertical_angle = max(-PI / 2 + 1e-3,
                                  min(self.vertical_angle, PI / 2 - 1e-3))

    def look_at(self, target):
        """Aim at a world point (beyond-reference convenience: sets the
        spherical angles so ``direction`` points at ``target``; pitch
        clamped like :meth:`look`)."""
        d = np.asarray(target, np.float64) - np.asarray(self.position,
                                                        np.float64)
        n = np.linalg.norm(d)
        if n < 1e-12:
            return
        d = d / n
        self.vertical_angle = max(-PI / 2 + 1e-3,
                                  min(float(np.arcsin(np.clip(d[2], -1, 1))),
                                      PI / 2 - 1e-3))
        self.horizontal_angle = float(np.arctan2(d[0], d[1]))

    def basis(self, cfg: RenderConfig):
        """Projection basis.  Reference: kernel.cu:699-700."""
        d = self.direction
        right = np.cross(d, self.up)
        right = right / np.linalg.norm(right)
        up2 = np.cross(right, d)
        up2 = up2 / np.linalg.norm(up2)
        aspect = cfg.width / cfg.height
        return (right * 1.5 * aspect).astype(np.float32), \
            (up2 * 1.5).astype(np.float32)

    def to_device(self, cfg: RenderConfig) -> CameraParams:
        right, up2 = self.basis(cfg)
        return CameraParams(
            position=jnp.asarray(self.position),
            direction=jnp.asarray(self.direction),
            right=jnp.asarray(right),
            up=jnp.asarray(up2),
            focal_distance=jnp.asarray(self.focal_distance, jnp.float32),
            lens_radius=jnp.asarray(self.lens_radius, jnp.float32),
        )

    def pose_key(self):
        """Hashable pose for accumulation-reset detection (the reference
        compares last_pos/last_dir/DoF each frame, kernel.cu:688-702)."""
        return (tuple(np.round(self.position, 6).tolist()),
                round(self.horizontal_angle, 9), round(self.vertical_angle, 9),
                round(self.focal_distance, 9), round(self.lens_radius, 9))
