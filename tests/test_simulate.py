"""Simulation/accuracy harness tests."""

from reveal_tpu.utils.simulate import evaluate_rem, simulate_population


def test_population_ids_track_homology():
    pop = simulate_population(3, 5000, seed=0)
    assert len(pop) == 3
    for name, seq, ids in pop:
        assert len(seq) == len(ids)


def test_rem_accuracy_on_simulated_population():
    r = evaluate_rem(n=3, length=10000, seed=2, minlength=20, backend="np")
    assert r.mean_f1 > 0.85
    for v in r.per_pair.values():
        assert v["precision"] > 0.95  # anchors must be near-exact


def test_refine_improves_sensitivity():
    base = evaluate_rem(n=3, length=4000, seed=3, minlength=20, backend="np")
    ref = evaluate_rem(
        n=3, length=4000, seed=3, minlength=20, backend="np", refine=True
    )
    assert ref.mean_f1 >= base.mean_f1 - 0.01  # refine must not hurt
