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


def test_training_macs_accounting():
    """Training step = 3x forward + the remat policy's recompute; the
    policies order correctly (False < selective < True) and recompute is
    never counted as useful work."""
    kwargs = dict(folded_impl="banded_slab")
    none = flops.training_macs(576, 960, 255, remat=False, **kwargs)
    selective = flops.training_macs(576, 960, 255, remat="selective",
                                    **kwargs)
    blanket = flops.training_macs(576, 960, 255, remat=True, **kwargs)

    for accounting in (none, selective, blanket):
        assert abs(accounting["backward_gmacs"]
                   - 2 * accounting["forward_gmacs"]) < 0.05
        assert abs(accounting["executed_gmacs"]
                   - (3 * accounting["forward_gmacs"]
                      + accounting["recompute_gmacs"])) < 0.05
        # Useful MACs are policy-independent (remat is execution, not math).
        assert accounting["useful_gmacs"] == none["useful_gmacs"]

    assert none["recompute_gmacs"] == 0.0
    assert 0 < selective["recompute_gmacs"] < blanket["recompute_gmacs"]
    # The checkpointed sets mirror the model code: blanket recompute is one
    # full forward minus the (never-checkpointed) embedding stages.
    stages = {s.name: s for s in flops.forward_macs(
        576, 960, 255, folded_impl="banded_slab")}
    embedding = (stages["embedding (x2 images)"].executed
                 + stages["left shortcut"].executed) / 1e9
    assert abs(blanket["recompute_gmacs"]
               - (blanket["forward_gmacs"] - embedding)) < 0.05
