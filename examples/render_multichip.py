"""Data-parallel rendering over every available device (pixel-strip
sharding).  On a CPU host run with:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/render_multichip.py
"""

import numpy as np

from tyrant_tpu.camera import Camera
from tyrant_tpu.config import RenderConfig
from tyrant_tpu.ops.tonemap import to_uint8
from tyrant_tpu.parallel import ShardedRenderer
from tyrant_tpu.scene.procgen import terrain
from tyrant_tpu.scene.scene import Scene

import jax


def main():
    n_dev = len(jax.devices())
    cfg = RenderConfig(width=320, height=n_dev * 30 if (n_dev * 30) % 8 == 0
                       else n_dev * 32, num_rays=1 << 14)
    v0, v1, v2 = terrain(n_quads=64, towers=6)
    scene = Scene.from_triangles(v0, v1, v2)
    r = ShardedRenderer(scene, cfg)

    cam = Camera()
    cam.position = np.array([0.0, -260.0, 60.0], np.float32)
    cam.vertical_angle = -0.15
    r.step(cam, 40)

    img = np.asarray(to_uint8(r.image()))
    from PIL import Image
    Image.fromarray(img).save("multichip.png")
    print(f"rendered on {n_dev} devices -> multichip.png")


if __name__ == "__main__":
    main()
