"""Shared torch-side test fixtures (reference-model test utilities)."""

import torch


def pin_reference_fps(monkeypatch):
    """Replace the reference hengshuang FPS (random start,
    `pointnet_util.py:65`) with the start-0 convention `ops.fps` uses,
    so torch/flax groupings coincide in differential tests."""
    import PointDA.hengshuang_transformer.pointnet_util as pu

    def fps0(xyz, npoint):
        device = xyz.device
        B, N, _ = xyz.shape
        centroids = torch.zeros(B, npoint, dtype=torch.long).to(device)
        distance = torch.ones(B, N).to(device) * 1e10
        farthest = torch.zeros(B, dtype=torch.long).to(device)
        batch_indices = torch.arange(B, dtype=torch.long)
        for i in range(npoint):
            centroids[:, i] = farthest
            centroid = xyz[batch_indices, farthest, :].view(B, 1, 3)
            dist = torch.sum((xyz - centroid) ** 2, -1)
            distance = torch.min(distance, dist)
            farthest = torch.max(distance, -1)[1]
        return centroids

    monkeypatch.setattr(pu, "farthest_point_sample", fps0)
