"""Weak-scaling shape on the virtual CPU mesh (r4 verdict #7).

Absolute weak scaling is unmeasurable here (8 virtual devices share 2
physical cores), but the scaling SHAPE still distinguishes a healthy
data-parallel step (total samples/s ~flat once the cores saturate) from an
accidentally serialized one — e.g. a replicated eval where every device
processes the FULL batch decays throughput ~1/N. The dryrun driver runs the
same check as phase 6 (`__graft_entry__.weak_scaling_curve`).
"""
import pytest


@pytest.mark.slow
def test_weak_scaling_shape():
    import __graft_entry__ as ge

    curve = ge.weak_scaling_curve(n_list=(1, 4, 8), steps=3)
    assert set(curve) == {1, 4, 8}
    ratio = curve[8] / curve[1]
    assert ratio >= 0.6, curve
