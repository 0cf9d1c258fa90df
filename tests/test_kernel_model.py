"""Calibrated op-level cost model (utils/kernel_model.py).

The structural counting must track kernel geometry (these are the bounds
bench.py reports achievement against); the measurement path itself needs
a real device and is exercised by bench/scripts, not CI.
"""

import numpy as np
import pytest

from custereomatching_tpu.utils.kernel_model import (
    OpCount,
    _box_ops,
    _win_sum_ops,
    fused_backward_c_cost,
    fused_backward_cost,
    fused_forward_cost,
    volume_backward_cost,
    volume_forward_cost,
)

RATES = {"madd": 0.4e-12, "lshift": 2.0e-12, "sshift": 0.4e-12,
         "exp": 0.6e-12, "rsqrt": 2.0e-12, "boxadd": 0.67e-12}
H, W, D, K = 375, 1242, 192, 15


def test_win_sum_count_matches_tree_structure():
    # k=15 subtractive form (needs in_len >= out+16-1 = 47):
    # 3 doubling adds + 1 combine + 1 tap removal.
    c = _win_sum_ops(15, 48, 32, 1408, axis=0)
    total = sum(c.values())
    # Hand count: (47 + 45 + 41 + 32 + 32) rows x 1408 cols.
    assert total == (47 + 45 + 41 + 32 + 32) * 1408
    # One row short of the subtractive requirement -> binary combine
    # (the same fallback the kernel takes), which costs more.
    c2 = _win_sum_ops(15, 46, 32, 1408, axis=0)
    assert sum(c2.values()) > total


def test_box_ops_uses_boxadd_class():
    c = _box_ops(15, 46, 32, 1408, 1280)
    assert c["boxadd"] > 0
    assert all(c[m] == 0 for m in c if m != "boxadd")


def test_costs_scale_with_shape_and_tiles():
    base = fused_forward_cost(H, W, D, K, 32, 40)
    double_d = fused_forward_cost(H, W, 2 * D, K, 32, 40)
    t0 = base.time(RATES, 8.19e11)["t_compute_s"]
    t1 = double_d.time(RATES, 8.19e11)["t_compute_s"]
    assert 1.7 < t1 / t0 < 2.3          # compute ~linear in D
    # Taller tiles reduce halo-inflated work for the backward.
    slim = fused_backward_cost(H, W, D, K, 16, 8)
    tall = fused_backward_cost(H, W, D, K, 64, 8)
    assert tall.time(RATES, 8.19e11)["t_compute_s"] \
        < slim.time(RATES, 8.19e11)["t_compute_s"]


def test_variant_ordering():
    """Structural sanity: the cost-residual backwards are cheaper than
    the recompute-from-images backward; writing the volume costs more
    than not writing it."""
    hbm = 8.19e11
    t = {
        "fwd": fused_forward_cost(H, W, D, K, 32, 40),
        "fwd_v": fused_forward_cost(H, W, D, K, 48, 8, write_volume=True),
        "bwd": fused_backward_cost(H, W, D, K, 48, 8),
        "bwd_c": fused_backward_c_cost(H, W, D, K, 40),
        "vol_fwd": volume_forward_cost(H, W, D, K, 48, 8),
        "vol_bwd_c": volume_backward_cost(H, W, D, K, 40, 8, True),
        "vol_bwd": volume_backward_cost(H, W, D, K, 48, 8, False),
    }
    b = {k: v.time(RATES, hbm)["bound_s"] for k, v in t.items()}
    assert b["bwd_c"] < b["bwd"]
    assert b["vol_bwd_c"] < b["vol_bwd"]
    assert b["fwd_v"] > b["vol_fwd"] * 0.9      # fwd_v ⊇ volume work
    assert t["fwd_v"].bytes > t["fwd"].bytes    # volume write priced
    # All bounds are physical (sub-10ms at this scale, positive).
    assert all(0 < x < 0.01 for x in b.values())


def test_opcount_algebra():
    a = OpCount(madd=10)
    a.bytes = 100.0
    bb = OpCount(lshift=5)
    bb.bytes = 50.0
    c = (a + bb).scaled(2)
    assert c["madd"] == 20 and c["lshift"] == 10 and c.bytes == 300.0


def test_opcount_byte_pools_and_dma_pricing():
    """bytes_r/bytes_w propagate through the algebra; time() prices the
    memory leg with measured DMA rates when present, else datasheet BW."""
    a = OpCount(madd=1)
    a.bytes_r, a.bytes_w, a.bytes = 100.0, 10.0, 110.0
    b = OpCount()
    b.bytes_r, b.bytes_w, b.bytes = 50.0, 5.0, 55.0
    c = (a + b).scaled(2)
    assert c.bytes_r == 300.0 and c.bytes_w == 30.0 and c.bytes == 330.0

    dma_rates = dict(RATES, hbm_r3d=2.0e-12, hbm_w3d=4.0e-12)
    t_dma = c.time(dma_rates, 8.19e11)
    expect = 300.0 * 2.0e-12 + 30.0 * 4.0e-12
    assert abs(t_dma["t_memory_s"] - expect) < 1e-18
    # Compute-only rate dict -> datasheet bandwidth fallback.
    t_bw = c.time(RATES, 8.19e11)
    assert abs(t_bw["t_memory_s"] - 330.0 / 8.19e11) < 1e-18


def test_cost_fns_populate_byte_pools():
    costs = [
        fused_forward_cost(H, W, D, K, 32, 40),
        fused_forward_cost(H, W, D, K, 48, 8, write_volume=True),
        fused_backward_cost(H, W, D, K, 48, 8),
        fused_backward_c_cost(H, W, D, K, 40),
        volume_forward_cost(H, W, D, K, 48, 8),
        volume_backward_cost(H, W, D, K, 40, 8, True),
    ]
    for c in costs:
        assert c.bytes_r > 0 and c.bytes_w > 0
        assert c.bytes == pytest.approx(c.bytes_r + c.bytes_w)


def test_rates_cache_dma_fallback_branches(tmp_path):
    """A compute-only (pre-DMA-era) cache is returned as-is when
    measurement is disabled; an absent device kind returns None."""
    import json

    import jax

    from custereomatching_tpu.utils.kernel_model import measure_vpu_rates

    kind = jax.devices()[0].device_kind
    path = tmp_path / "rates.json"
    path.write_text(json.dumps({kind: dict(RATES)}))
    got = measure_vpu_rates(cache_path=str(path), measure_if_missing=False)
    assert got == {k: pytest.approx(v) for k, v in RATES.items()}

    path.write_text(json.dumps({"some other device": dict(RATES)}))
    assert measure_vpu_rates(cache_path=str(path),
                             measure_if_missing=False) is None


def test_trainable_backward_models_dt16_plane_padding():
    """fused_backward_c_cost mirrors the forward's 16-aligned plane
    declaration: KITTI D=192 (200 -> 208 planes) runs dt=16, which must
    price strictly cheaper tile overheads than an 8-divisible-only D."""
    # D=199: 200 planes, decl 208, 208-200=8 < 16 -> padded, dt=16.
    padded = fused_backward_c_cost(H, W, 199, K, 40)
    # D=207: 208 planes already 16-divisible -> dt=16 without padding.
    native16 = fused_backward_c_cost(H, W, 207, K, 40)
    # Same tile geometry -> per-plane costs within a plane-count ratio.
    t_p = padded.time(RATES, 8.19e11)["t_compute_s"]
    t_n = native16.time(RATES, 8.19e11)["t_compute_s"]
    assert 0.9 < (t_p / t_n) / (200 / 208) < 1.1
