"""Pin the analytic FLOP accounting (utils/flops.py) that bench.py's MFU
report is built on — a silent formula drift would corrupt every published
MFU number."""

import numpy as np

from deepbedmap_tpu.config import GeneratorConfig
from deepbedmap_tpu.utils.flops import generator_mfu, generator_tile_flops


def test_trunk_flops_hand_count():
    # one RDB at 286^2 latent: 5 convs 64->32, 96->32, 128->32, 160->32,
    # 192->64, 3x3 taps = 239,616 MACs/px; 12 RRDB x 3 RDB = 36 blocks
    f = generator_tile_flops(lr=288)
    macs_per_px = 9 * (64 * 32 + 96 * 32 + 128 * 32 + 160 * 32 + 192 * 64)
    assert macs_per_px == 239_616
    expect = 2.0 * 36 * macs_per_px * 286**2
    np.testing.assert_allclose(f["trunk"], expect, rtol=0)


def test_total_flops_continent_tile():
    # the headline workload: 288-px lr tile -> 1.71 TFLOP useful forward
    f = generator_tile_flops(lr=288)
    assert f["total"] == sum(v for k, v in f.items() if k != "total")
    np.testing.assert_allclose(f["total"], 1.715e12, rtol=0.01)
    # trunk dominates (~82%) — the roofline table's shape
    assert 0.78 < f["trunk"] / f["total"] < 0.86


def test_flops_scale_with_depth_and_size():
    base = generator_tile_flops(GeneratorConfig(), lr=288)
    deep = generator_tile_flops(
        GeneratorConfig(num_residual_blocks=24), lr=288
    )
    np.testing.assert_allclose(deep["trunk"], 2 * base["trunk"], rtol=0)
    # quadratic in image side (up to the -2 latent shave)
    small = generator_tile_flops(GeneratorConfig(), lr=145)
    assert base["trunk"] / small["trunk"] == (286 / 143) ** 2


def test_phase_conv_flops_hand_count():
    """upsample_phase_conv counts the executed algorithm's minimal work:
    16 MACs per SOURCE px per stage vs the literal 9 per HI-RES px
    (36 per source px) — a 2.25x reduction of the upsample-conv stage."""
    lit = generator_tile_flops(GeneratorConfig(), lr=288)
    ph = generator_tile_flops(
        GeneratorConfig(upsample_phase_conv=True), lr=288
    )
    np.testing.assert_allclose(
        lit["upsample_convs"] / ph["upsample_convs"], 2.25, rtol=0
    )
    expect = 2.0 * 16 * 64 * 64 * (286**2 + 572**2)
    np.testing.assert_allclose(ph["upsample_convs"], expect, rtol=0)
    for k in ("trunk", "deform64", "deform1", "input_block"):
        np.testing.assert_allclose(ph[k], lit[k], rtol=0)


def test_mfu_report():
    # 115 ms/tile (the round-3 measured forward) -> ~14.9 TFLOP/s, ~7.6% MFU
    m = generator_mfu(0.115, lr=288)
    np.testing.assert_allclose(m["achieved_tflops"], 14.9, rtol=0.02)
    np.testing.assert_allclose(m["mfu"], 0.0757, rtol=0.02)
