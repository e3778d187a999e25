"""Wavefront OBJ loader (pure numpy).

The reference imports via Assimp which handles many formats
(Scene.cpp:4-5); only PLY assets are bundled, but OBJ is the other format
users reach for first.  Supports v/f records, polygon fan-triangulation,
negative (relative) indices, and the `v/vt/vn` index forms.
"""

from __future__ import annotations

import numpy as np


def load_obj(path: str):
    """Returns (vertices [V,3] float32, faces [F,3] int32)."""
    verts = []
    faces = []
    with open(path, "r", errors="replace") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append((float(parts[1]), float(parts[2]),
                              float(parts[3])))
            elif line.startswith("f "):
                idx = []
                for tok in line.split()[1:]:
                    i = tok.split("/")[0]
                    k = int(i)
                    idx.append(k - 1 if k > 0 else len(verts) + k)
                for j in range(1, len(idx) - 1):
                    faces.append((idx[0], idx[j], idx[j + 1]))
    if not verts:
        raise ValueError(f"{path}: no vertices")
    return (np.asarray(verts, np.float32),
            np.asarray(faces, np.int32).reshape(-1, 3))
