"""Render the default 7-sphere scene (the reference's Cornell-style
arrangement, kernel.cu:674-680) to a PNG.

Usage: python examples/render_spheres.py [out.png]
"""

import sys

import numpy as np

from tyrant_tpu.camera import Camera
from tyrant_tpu.config import RenderConfig
from tyrant_tpu.ops.tonemap import to_uint8
from tyrant_tpu.render import Renderer
from tyrant_tpu.scene.scene import Scene


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "spheres.png"
    cfg = RenderConfig(width=800, height=600, num_rays=1 << 19)
    r = Renderer(Scene.load(None), cfg)

    cam = Camera()
    cam.position = np.array([0.0, -170.0, 40.0], np.float32)
    cam.vertical_angle = -0.10

    r.step(cam, 300)
    img = np.asarray(to_uint8(r.image()))
    from PIL import Image
    Image.fromarray(img).save(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
