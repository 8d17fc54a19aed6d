"""Factor-graph Graphviz export.

Parity feature with ``graph.saveGraph("graph.dot")`` (reference
batch.py:338): emit a dot file with variable nodes (x_i, v_i, b, l_j) and
factor nodes connecting them, for structural inspection.
"""

from __future__ import annotations

import numpy as np

from uslam_tpu.graph.builder import GraphArrays


def graph_to_dot(graph: GraphArrays, num_poses: int, num_landmarks: int) -> str:
    lines = ["graph factor_graph {"]
    lines.append('  node [shape=circle];')
    for i in range(num_poses):
        lines.append(f'  x{i} [label="x{i}"];')
        lines.append(f'  v{i} [label="v{i}"];')
    lines.append('  b0 [label="b"];')
    for j in range(num_landmarks):
        lines.append(f'  l{j} [label="l{j}", shape=point];')
    lines.append('  node [shape=box, style=filled, fillcolor=gray, width=0.15, label=""];')

    fid = 0

    def factor(*vars_):
        nonlocal fid
        name = f"f{fid}"
        fid += 1
        out = [f"  {name};"]
        for v in vars_:
            out.append(f"  {name} -- {v};")
        return out

    lines += factor("x0")          # pose prior
    lines += factor("v0")          # vel prior
    if float(graph.priors.bias_weight) > 0:
        lines += factor("b0")
    imu_mask = np.asarray(graph.imu.mask)
    for k in range(len(imu_mask)):
        if imu_mask[k] > 0:
            lines += factor(f"x{k}", f"v{k}", f"x{k+1}", f"v{k+1}", "b0")
    dvl_mask = np.asarray(graph.dvl.mask)
    for i in range(len(dvl_mask)):
        if dvl_mask[i] > 0:
            lines += factor(f"v{i}", f"x{i}")
    s_mask = np.asarray(graph.stereo.mask)
    cam = np.asarray(graph.stereo.cam_idx)
    lm = np.asarray(graph.stereo.lm_idx)
    for f in range(len(s_mask)):
        if s_mask[f] > 0:
            lines += factor(f"x{cam[f]}", f"l{lm[f]}")
    lines.append("}")
    return "\n".join(lines)


def save_graph_dot(
    path: str, graph: GraphArrays, num_poses: int, num_landmarks: int
) -> None:
    with open(path, "w") as f:
        f.write(graph_to_dot(graph, num_poses, num_landmarks))
