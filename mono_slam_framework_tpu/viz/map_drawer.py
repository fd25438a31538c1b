"""Offline map viewer / trajectory-and-cloud recorder.

Capability twin of the reference MapDrawer (include/MapDrawer.h,
src/MapDrawer.cc): the reference runs a PCL GUI thread with a double-buffered
point cloud and camera pose cone. This environment is headless, so the TPU
rebuild keeps the same hook points (update / set_pos_dir / start / stop,
called from Tracking at the same places: Tracking.cc:113, 184-192) and
records map snapshots that can be dumped to .npz or rendered offline with
matplotlib.
"""

from __future__ import annotations

import numpy as np


class MapDrawer:
    def __init__(self, map_):
        self.map = map_
        self.running = False
        self.points = np.zeros((0, 3), np.float32)
        self.kf_centers = np.zeros((0, 3), np.float32)
        self.cam_pos = np.zeros(3, np.float32)
        self.cam_dir = np.array([0, 0, 1.0], np.float32)
        self.history: list[np.ndarray] = []

    def start(self) -> None:
        self.running = True

    def stop(self) -> None:
        self.running = False

    def update(self) -> None:
        """Snapshot the map (reference: double-buffer swap, MapDrawer.cc:30-55)."""
        pts = [mp.world_pos for mp in self.map.all_map_points() if not mp.is_bad]
        self.points = (
            np.stack(pts).astype(np.float32) if pts else np.zeros((0, 3), np.float32)
        )
        kfs = [
            kf.get_camera_center()
            for kf in self.map.all_keyframes()
            if not kf.is_bad and kf.Ow is not None
        ]
        self.kf_centers = (
            np.stack(kfs).astype(np.float32) if kfs else np.zeros((0, 3), np.float32)
        )

    def set_pos_dir(self, x, y, z, dx, dy, dz) -> None:
        self.cam_pos = np.array([x, y, z], np.float32)
        self.cam_dir = np.array([dx, dy, dz], np.float32)
        self.history.append(self.cam_pos.copy())

    def save(self, path: str) -> None:
        np.savez(
            path,
            points=self.points,
            kf_centers=self.kf_centers,
            trajectory=np.stack(self.history) if self.history else np.zeros((0, 3)),
        )

    def render(self, path: str) -> None:
        """Offline 3D scatter render (replaces the live PCL window)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(8, 6))
        ax = fig.add_subplot(111, projection="3d")
        if len(self.points):
            ax.scatter(*self.points.T, s=1, c="gray", alpha=0.5)
        if len(self.kf_centers):
            ax.scatter(*self.kf_centers.T, s=20, c="tab:blue", marker="^")
        if self.history:
            traj = np.stack(self.history)
            ax.plot(*traj.T, c="tab:red")
        ax.set_xlabel("x"), ax.set_ylabel("y"), ax.set_zlabel("z")
        fig.savefig(path, dpi=120)
        plt.close(fig)
