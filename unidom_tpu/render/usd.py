"""USD scene export without the pxr dependency: hand-written USDA (ASCII).

The reference exports cloth/liquid/mixture USD stages with time-sampled
geometry via usd-core (DaXBench engine/usdrender/{mesh_usd.py,water_usd.py,
mix_usd.py:10-211}). usd-core is not available here, but USDA is a stable
text format — this module writes time-sampled Mesh and Points prims any USD
viewer (usdview, Omniverse, Blender) opens directly.
"""

import numpy as np


def _fmt_vecs(arr):
    return "[" + ", ".join(f"({v[0]:.6g}, {v[1]:.6g}, {v[2]:.6g})" for v in arr) + "]"


def _fmt_ints(arr):
    return "[" + ", ".join(str(int(v)) for v in arr) + "]"


def _header(end_time, fps=24):
    return (
        '#usda 1.0\n(\n    defaultPrim = "World"\n'
        f"    startTimeCode = 0\n    endTimeCode = {end_time}\n"
        f"    timeCodesPerSecond = {fps}\n    upAxis = \"Y\"\n)\n\n"
        'def Xform "World"\n{\n'
    )


def create_usd_cloth_scene(vertices_frames, indices, path, fps=24):
    """Time-sampled cloth mesh (mesh_usd.py parity).

    vertices_frames: (T, V, 3); indices: (F, 3) triangle indices.
    """
    vertices_frames = np.asarray(vertices_frames)
    indices = np.asarray(indices).reshape(-1, 3)
    T = len(vertices_frames)

    with open(path, "w") as f:
        f.write(_header(T - 1, fps))
        f.write('    def Mesh "cloth"\n    {\n')
        f.write(f"        int[] faceVertexCounts = {_fmt_ints([3] * len(indices))}\n")
        f.write(f"        int[] faceVertexIndices = {_fmt_ints(indices.reshape(-1))}\n")
        f.write("        point3f[] points.timeSamples = {\n")
        for t in range(T):
            f.write(f"            {t}: {_fmt_vecs(vertices_frames[t])},\n")
        f.write("        }\n")
        f.write('        uniform token subdivisionScheme = "none"\n')
        f.write("    }\n")
        f.write("}\n")
    return path


def create_usd_points_scene(points_frames, path, width=0.004, fps=24, name="liquid"):
    """Time-sampled particle cloud (water_usd.py parity)."""
    points_frames = np.asarray(points_frames)
    T = len(points_frames)
    n = points_frames.shape[1]

    with open(path, "w") as f:
        f.write(_header(T - 1, fps))
        f.write(f'    def Points "{name}"\n    {{\n')
        f.write("        point3f[] points.timeSamples = {\n")
        for t in range(T):
            f.write(f"            {t}: {_fmt_vecs(points_frames[t])},\n")
        f.write("        }\n")
        f.write(f"        float[] widths = [{', '.join([str(width)] * min(n, 1))}]"
                " (interpolation = \"constant\")\n")
        f.write("    }\n")
        f.write("}\n")
    return path


def create_usd_mix_scene(cloth_frames, cloth_indices, points_frames, path, fps=24):
    """Mesh + particles in one stage (mix_usd.py parity)."""
    cloth_frames = np.asarray(cloth_frames)
    points_frames = np.asarray(points_frames)
    indices = np.asarray(cloth_indices).reshape(-1, 3)
    T = max(len(cloth_frames), len(points_frames))

    with open(path, "w") as f:
        f.write(_header(T - 1, fps))
        f.write('    def Mesh "cloth"\n    {\n')
        f.write(f"        int[] faceVertexCounts = {_fmt_ints([3] * len(indices))}\n")
        f.write(f"        int[] faceVertexIndices = {_fmt_ints(indices.reshape(-1))}\n")
        f.write("        point3f[] points.timeSamples = {\n")
        for t in range(len(cloth_frames)):
            f.write(f"            {t}: {_fmt_vecs(cloth_frames[t])},\n")
        f.write("        }\n    }\n")
        f.write('    def Points "particles"\n    {\n')
        f.write("        point3f[] points.timeSamples = {\n")
        for t in range(len(points_frames)):
            f.write(f"            {t}: {_fmt_vecs(points_frames[t])},\n")
        f.write("        }\n    }\n")
        f.write("}\n")
    return path
