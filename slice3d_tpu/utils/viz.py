"""Matplotlib debug visualizers for voxels and pointclouds.

Parity target: ``reg_slices/src_convonet/utils/visualize.py`` — same axis
convention (the plot's x axis is world Z, etc.) so saved debug images are
comparable side-by-side with the reference's.  Rewritten against the
modern matplotlib API (``fig.gca(projection=...)`` was removed in 3.6).

matplotlib is imported lazily so nothing on the compute path pays for it.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def _axes3d():
    import matplotlib
    matplotlib.use("Agg", force=False)
    from matplotlib import pyplot as plt
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    return plt, fig, ax


def visualize_data(data, data_type: Optional[str], out_file: str) -> None:
    """Dispatch on ``data_type`` ('voxels' | 'pointcloud' | None/'idx')."""
    if data_type == "voxels":
        visualize_voxels(data, out_file=out_file)
    elif data_type == "pointcloud":
        visualize_pointcloud(data, out_file=out_file)
    elif data_type is None or data_type == "idx":
        pass
    else:
        raise ValueError(f'Invalid data_type "{data_type}"')


def visualize_voxels(voxels, out_file: Optional[str] = None,
                     show: bool = False) -> None:
    """Render an occupancy grid with matplotlib's 3-D voxel artist."""
    voxels = np.asarray(voxels)
    plt, fig, ax = _axes3d()
    ax.voxels(voxels.transpose(2, 0, 1), edgecolor="k")
    ax.set_xlabel("Z")
    ax.set_ylabel("X")
    ax.set_zlabel("Y")
    ax.view_init(elev=30, azim=45)
    if out_file is not None:
        fig.savefig(out_file)
    if show:
        plt.show()
    plt.close(fig)


def visualize_pointcloud(points, normals=None,
                         out_file: Optional[str] = None,
                         show: bool = False) -> None:
    """Scatter an (N, 3) cloud (optionally with normal quivers) in the
    unit cube, reference axis convention."""
    points = np.asarray(points)
    plt, fig, ax = _axes3d()
    ax.scatter(points[:, 2], points[:, 0], points[:, 1])
    if normals is not None:
        normals = np.asarray(normals)
        ax.quiver(points[:, 2], points[:, 0], points[:, 1],
                  normals[:, 2], normals[:, 0], normals[:, 1],
                  length=0.1, color="k")
    ax.set_xlabel("Z")
    ax.set_ylabel("X")
    ax.set_zlabel("Y")
    ax.set_xlim(-0.5, 0.5)
    ax.set_ylim(-0.5, 0.5)
    ax.set_zlim(-0.5, 0.5)
    ax.view_init(elev=30, azim=45)
    if out_file is not None:
        fig.savefig(out_file)
    if show:
        plt.show()
    plt.close(fig)
