"""Faithful time_warp: the numpy sparse-image-warp must match the
reference's torch implementation (captioning/datasets/
nb_SparseImageWarp.py) at fixed control points.

Two reference quirks pin the tolerance story:
  * torch.solve was removed in torch>=2 (the stub raises) — shimmed
    onto torch.linalg.solve (solve(B, A) -> A X = B);
  * the spline system is SINGULAR under the reference's scalar-norm
    distance quirk; its solution exists only through float32 rounding
    + a randn*eps corner block, and moves ~0.3 px across torch seeds.
    Our lstsq (minimum-norm) solution is the noise-free limit, so the
    dense FLOW fields are compared to that measured noise floor.
"""

import os
import sys

import numpy as np
import pytest

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "captioning")),
    reason="reference repo not mounted")


def _import_ref_warp():
    import torch
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    # torch>=2 ships a removed-API stub that raises; always replace
    torch.solve = lambda B, A: (torch.linalg.solve(A, B), None)
    from captioning.datasets import nb_SparseImageWarp as ref
    return ref


@pytest.mark.parametrize("pt,shift", [(30.0, 4.0), (50.5, -3.25),
                                      (12.0, 0.5)])
def test_sparse_image_warp_matches_reference(pt, shift):
    import torch
    ref = _import_ref_warp()
    from audiocaption_tpu.data.augment import (sparse_image_warp_np,
                                               time_warp_points)
    rng = np.random.RandomState(0)
    T, F = 80, 64
    spec = rng.randn(T, F).astype(np.float32)
    img = np.ascontiguousarray(spec.T)          # [F, T], (y=freq, x=time)
    src, dst = time_warp_points(T, F, pt, shift)
    got, flow = sparse_image_warp_np(img, src, dst)

    timg = torch.as_tensor(img)[None]           # [1, H=F, W=T]
    torch.manual_seed(0)                        # ref solve adds randn*eps
    ref_out, ref_flows = ref.sparse_image_warp(
        timg, torch.as_tensor(src, dtype=torch.float32)[None],
        torch.as_tensor(dst, dtype=torch.float32)[None])
    ref_np = ref_out.squeeze(3).squeeze(0).numpy()
    ref_flow = ref_flows.squeeze(0).numpy()

    # dense flow agrees to the reference's own seed-to-seed noise floor
    assert np.abs(flow - ref_flow).max() < 0.5
    assert np.abs(flow - ref_flow).mean() < 0.1
    # warped values: flow noise times local image gradient (the test
    # image is white noise — the worst case for pointwise comparison)
    diff = np.abs(got - ref_np)
    assert diff.mean() < 0.15
    assert np.quantile(diff, 0.99) < 1.0


def test_time_warp_end_to_end_matches_reference_formula():
    """The time_warp wrapper builds exactly the reference's control
    points (first F//2 freq rows at one time coordinate, augment.py:
    14-26): checked by reproducing its output from time_warp_points."""
    import random as pyrandom

    from audiocaption_tpu.data.augment import (sparse_image_warp_np,
                                               time_warp, time_warp_points)
    rng = np.random.RandomState(1)
    spec = rng.randn(60, 32).astype(np.float32)
    W = 5
    pyrandom.seed(7)
    out = time_warp(W)(spec)
    pyrandom.seed(7)
    pt = (60 - 2 * W) * pyrandom.random() + W
    shift = 2 * W * pyrandom.random() - W
    src, dst = time_warp_points(60, 32, pt, shift)
    expect, _ = sparse_image_warp_np(spec.T, src, dst)
    np.testing.assert_array_equal(out, expect.T)


def test_zero_shift_is_identity():
    from audiocaption_tpu.data.augment import (sparse_image_warp_np,
                                               time_warp_points)
    rng = np.random.RandomState(2)
    spec = rng.randn(50, 16).astype(np.float32)
    src, dst = time_warp_points(50, 16, 20.0, 0.0)
    out, flow = sparse_image_warp_np(spec.T, src, dst)
    np.testing.assert_allclose(np.abs(flow).max(), 0.0, atol=1e-8)
    np.testing.assert_allclose(out.T, spec, atol=1e-6)
