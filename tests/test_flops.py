"""FLOP-accounting sanity tests (utils/flops.py is pure arithmetic)."""

from practicaldeepstereo_nips2018_tpu.utils import flops


def test_forward_macs_structure():
    stages = flops.forward_macs(576, 960, 191)
    names = [stage.name for stage in stages]
    assert "hourglass core (folded)" in names
    assert "upsamplers (folded)" in names
    for stage in stages:
        assert stage.useful > 0
        # Executed MACs can never be below the mathematically necessary ones.
        assert stage.executed >= stage.useful, stage.name


def test_summary_overhead_range():
    summary = flops.summarize(flops.forward_macs(576, 960, 191))
    # The folded/paired layouts trade a bounded factor of structural zeros
    # for lane alignment; if this drifts far outside the measured ~2.9x the
    # model (or the implementation) changed and the bench detail is lying.
    assert 1.5 < summary["structural_overhead"] < 6.0
    assert summary["executed_gmacs"] > summary["useful_gmacs"] > 100


def test_embedding_stage_has_no_waste():
    stages = {s.name: s for s in flops.forward_macs(576, 960, 191)}
    stage = stages["embedding (x2 images)"]
    assert stage.useful == stage.executed


def test_peak_lookup():
    assert flops.peak_bf16_flops("TPU v5 lite") == 197e12
    assert flops.peak_bf16_flops("TPU v4") == 275e12
    assert flops.peak_bf16_flops("SparseCore") is None
