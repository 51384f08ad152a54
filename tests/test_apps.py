"""App-driver integration tests on the CPU mesh with tiny budgets:
recovery study end-to-end, Stahl fitting on a synthetic fixture CSV,
imputation pipeline, misspecification generators, simulation figures."""

import json
import os

import numpy as np
import pytest


def _write_fixture_csv(path, n_subj=5, n_trials=40, seed=0):
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        f.write("subj_idx,rt,response,type,pre_Ne,pre_Pe\n")
        for s in range(1, n_subj + 1):
            for _ in range(n_trials):
                rt = rng.uniform(0.25, 1.4)
                resp = rng.integers(0, 2)
                ne = rng.normal()
                pe = 0.5 * ne + rng.normal()
                f.write(f"{s},{rt:.4f},{resp},go,{ne:.4f},{pe:.4f}\n")
    return path


def test_stahl_loader_and_padding(tmp_path):
    from bayesflow_nddms_tpu.data.stahl import load_stahl_csv, to_padded_batch
    csv = _write_fixture_csv(tmp_path / "fix.csv")
    d = load_stahl_csv(str(csv))
    assert len(d.participants) == 5
    # residualization must remove the Ne component: corr(resid, Ne) ~ 0
    r = np.corrcoef(d.normalized_ne,
                    d.alpha_like_pe * 3 - 3)[0, 1]
    assert abs(r) < 1e-6
    # alpha-like scaling: mean 1, sd 1/3 (fitting_stahl_data.py:109)
    assert abs(d.alpha_like_pe.mean() - 1.0) < 1e-6
    assert abs(d.alpha_like_pe.std() - 1 / 3) < 1e-6
    data, mask, log_n, parts, counts = to_padded_batch(d, "pe")
    assert data.shape == (5, 40, 2) and mask.all()
    np.testing.assert_allclose(np.exp(log_n[:, 0]), counts)
    # explicit n_pad below the largest participant must refuse to drop
    # trials unless truncation is explicitly allowed (VERDICT r2 Weak #7)
    with pytest.raises(ValueError, match="drop trials"):
        to_padded_batch(d, "pe", n_pad=30)
    data2, mask2, *_ = to_padded_batch(d, "pe", n_pad=30,
                                       allow_truncate=True)
    assert data2.shape == (5, 30, 2) and mask2.all()


def test_stahl_vendored_assets(tmp_path, monkeypatch):
    """The real-data pipeline must not depend on the reference checkout:
    the CSVs are vendored in-repo and checksum-pinned (VERDICT r4 #7)."""
    from bayesflow_nddms_tpu.data import stahl
    monkeypatch.chdir(tmp_path)   # away from the repo root
    p = stahl.resolve_csv("stahl_data/base_data.csv")
    assert p.startswith("/root/repo/"), p   # vendored copy, not reference
    # a corrupted known asset fails loudly
    bad = tmp_path / "base_data.csv"
    bad.write_text("subj_idx,rt\n1,0.5\n")
    with pytest.raises(ValueError, match="checksum mismatch"):
        stahl.resolve_csv(str(bad))
    # unknown filenames are not checksum-gated
    fix = _write_fixture_csv(tmp_path / "fixture.csv")
    assert stahl.resolve_csv(str(fix)) == str(fix)


@pytest.mark.slow
def test_recovery_study_app_tiny(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from bayesflow_nddms_tpu.apps.recovery_study import main
    res = main(["--model", "basic_ddm", "--steps", "20",
                "--batch-size", "16", "--num-test", "16", "--draws", "32",
                "--no-plots"])
    assert set(res["metrics"]) == {"drift", "alpha", "beta", "ter"}
    assert res["steps"] == 20


def test_fit_stahl_app_tiny(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    csv = _write_fixture_csv(tmp_path / "fix.csv")
    from bayesflow_nddms_tpu.apps.fit_stahl import main
    post, parts = main(["--csv", str(csv), "--draws", "16",
                        "--ckpt-dir", str(tmp_path / "ck"), "--no-plots",
                        "--psis", "--n-quad", "6", "--trim-fast", "0.3",
                        "--json-out", str(tmp_path / "fit.json"),
                        "--out", str(tmp_path / "fit.npz")])
    assert post.shape == (5, 16, 8)
    assert np.all((post[..., 7] >= 0) & (post[..., 7] <= 1))  # prop_cog_var
    import json
    rep = json.load(open(tmp_path / "fit.json"))
    # uniform(0.25, 1.4) fixture RTs: a 0.3 s contaminant cutoff must
    # trim a few trials and the report must say how many
    assert 0 < rep["trimmed_fast_trials"] < 40
    # untrained net at 16 draws: khat may legitimately be inf (maximally
    # uncertified) — require one value per participant, none NaN
    assert len(rep["psis"]["khat_per_participant"]) == 5
    assert not np.isnan(rep["psis"]["khat_per_participant"]).any()
    assert 0.0 <= rep["psis"]["frac_certified"] <= 1.0
    npz = np.load(tmp_path / "fit.npz")
    assert npz["logw"].shape == (5, 16)
    assert not np.isnan(npz["logw"]).any()   # sanitized: -inf allowed


@pytest.mark.slow
def test_fit_stahl_refit_flagged_tiny(tmp_path, monkeypatch):
    """certify -> route -> exact NeuTra refit of the worst participant
    (mechanics: tiny NUTS budget, untrained flow — khat=inf flags all).
    Slow: the refit NUTS program is a multi-minute XLA CPU compile."""
    monkeypatch.chdir(tmp_path)
    csv = _write_fixture_csv(tmp_path / "fix.csv")
    from bayesflow_nddms_tpu.apps.fit_stahl import main
    import json
    r2 = main(["--csv", str(csv), "--draws", "16",
               "--ckpt-dir", str(tmp_path / "ck"), "--no-plots",
               "--psis", "--n-quad", "6", "--refit-flagged", "1",
               "--refit-warmup", "10", "--refit-samples", "6",
               "--refit-chains", "2", "--refit-max-depth", "3",
               "--refit-chunk", "8",
               "--json-out", str(tmp_path / "fit2.json"),
               "--out", str(tmp_path / "fit2.npz")])
    rep2 = json.load(open(tmp_path / "fit2.json"))
    (row,) = rep2["psis"]["refits"]
    assert row["n_trials"] > 0
    assert set(row["exact_mean"]) == set(row["amortized_dz"])
    assert "prop_cog_var" in row["exact_mean"]
    npz2 = np.load(tmp_path / "fit2.npz")
    s = npz2[f"refit_samples_p{row['participant']}"]
    assert s.shape == (6, 2, 8) and np.isfinite(s).all()


def test_imputation_app_tiny(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    csv = _write_fixture_csv(tmp_path / "fix.csv")
    from bayesflow_nddms_tpu.apps.imputation import main
    metrics = main(["--csv", str(csv), "--draws", "16",
                    "--ckpt-dir", str(tmp_path / "ck")])
    assert "drift" in metrics and "mu_alpha" in metrics


def test_imputation_app_standnorm_tiny(tmp_path, monkeypatch):
    """The retired standnorm imputation pipeline (imputation_from_stahl
    .py:32): raw standardized covariate channel, Var_Alpha truth."""
    monkeypatch.chdir(tmp_path)
    csv = _write_fixture_csv(tmp_path / "fix.csv")
    from bayesflow_nddms_tpu.apps.imputation import main
    metrics = main(["--model", "single_trial_alpha_standnorm",
                    "--csv", str(csv), "--draws", "16",
                    "--ckpt-dir", str(tmp_path / "ck")])
    assert "var_alpha" in metrics and "std_alpha" not in metrics


def test_imputation_app_standard_tiny(tmp_path, monkeypatch):
    """The retired standard imputation pipeline (imputation_from_stahl_
    standard.py:68,211): raw standardized covariate channel through the
    mean-centered model, Std_Alpha truth."""
    monkeypatch.chdir(tmp_path)
    csv = _write_fixture_csv(tmp_path / "fix.csv")
    from bayesflow_nddms_tpu.apps.imputation import main
    metrics = main(["--model", "single_trial_alpha_standard",
                    "--csv", str(csv), "--draws", "16",
                    "--ckpt-dir", str(tmp_path / "ck")])
    assert "std_alpha" in metrics and "var_alpha" not in metrics
    assert "sigma1" in metrics or "drift" in metrics


@pytest.mark.slow
def test_agreement_per_dataset_subset_tiny(tmp_path, monkeypatch):
    """--per-dataset + --only-datasets: the flagship marginal agreement
    fits each selected dataset in its own NUTS run and reports only the
    selected rows (mechanics test; NUTS budget far below inference
    quality)."""
    monkeypatch.chdir("/root/repo")  # needs the trained flagship ckpt
    from bayesflow_nddms_tpu.apps.agreement import main
    s = main(["--model", "single_trial_alpha_not_scaled",
              "--num-datasets", "2", "--only-datasets", "1",
              "--warmup", "20", "--samples", "6", "--chains", "2",
              "--max-depth", "3", "--chunk", "20", "--draws", "32",
              "--marginal", "--per-dataset", "--n-quad", "8",
              "--parameterization", "ridge", "--seed", "11",
              "--ckpt-dir", "trained/single_trial_alpha_not_scaled_100k_r3c"])
    assert s["num_datasets"] == 1
    assert set(s["per_param"]) == {"drift", "mu_alpha", "beta", "ter",
                                   "std_alpha", "dc", "sigma1"}
    for v in s["per_param"].values():
        assert np.isfinite(v["mean_abs_dz"])


def test_misspecification_generators():
    import jax
    from bayesflow_nddms_tpu.apps.misspecification import alternative_truths
    from bayesflow_nddms_tpu.models.spec import generate_training_batch
    for model in ("single_trial_alpha_not_scaled",
                  "single_trial_alpha_standard",
                  "single_trial_alpha_fixed"):
        for name, spec in alternative_truths(model).items():
            if name == "fine_dt":
                continue  # 4000-step sim is slow on CPU; TPU runs cover it
            theta, data, mask, log_n = generate_training_batch(
                spec, jax.random.PRNGKey(0), 2, 32)
            assert data.shape == (2, 32, 2), (model, name)
            assert np.isfinite(np.asarray(data)).all(), (model, name)


def test_misspecification_centering_conventions():
    """The scaled/trial_dc alternative truths must carry each model's own
    covariate centering: mean ~ 0 for standard/fixed (the reference's
    'mean of extdata1 is always zero' design, _standard.py:114-117),
    positive-mean for the flagship."""
    import jax
    import jax.numpy as jnp
    from bayesflow_nddms_tpu.apps.misspecification import (_scaled_spec,
                                                           _trial_dc_spec)
    key = jax.random.PRNGKey(4)
    for model, centered in [("single_trial_alpha_not_scaled", False),
                            ("single_trial_alpha_standard", True),
                            ("single_trial_alpha_fixed", True)]:
        spec = _scaled_spec(model, gamma_fixed=2.0)
        th = jnp.asarray([[1.0, 1.0, 0.5, 0.3, 0.2, 1.0, 0.3]], jnp.float32)
        data = spec.simulate(key, th, 4000)
        ext_mean = float(np.asarray(data[0, :, 1]).mean())
        # fixed centers at gamma*1 with mu_alpha = 1 -> also ~0 here
        assert (abs(ext_mean) < 0.25) == centered or not centered, model
        if centered:
            assert abs(ext_mean) < 0.25, (model, ext_mean)
        else:
            assert ext_mean > 1.0, (model, ext_mean)
        tdc = _trial_dc_spec(model)
        data2 = tdc.simulate(key, jnp.asarray(
            [[1.0, 1.2, 0.5, 0.3, 0.2, 1.0, 0.3]], jnp.float32), 4000)
        ext2 = float(np.asarray(data2[0, :, 1]).mean())
        if centered:
            assert abs(ext2) < 0.25, (model, ext2)
        else:
            assert ext2 > 0.5, (model, ext2)


def test_simulations_sweeps_monotonicity():
    from bayesflow_nddms_tpu.apps.simulations import parameter_sweeps
    res = parameter_sweeps(n_points=8, n_trials=2048)
    # higher boundary -> slower and more accurate (for positive drift)
    acc = np.array(res["boundary"]["accuracy"])
    mrt = np.array(res["boundary"]["mean_rt"])
    assert acc[-1] > acc[0]
    assert mrt[-1] > mrt[0]
    # drift sweep: accuracy increases with drift
    acc_d = np.array(res["drift"]["accuracy"])
    assert acc_d[-1] > 0.9 and acc_d[0] < 0.1
    # dc sweep: higher dc -> less accurate (fixed boundary), faster
    acc_dc = np.array(res["dc"]["accuracy"])
    mrt_dc = np.array(res["dc"]["mean_rt"])
    assert acc_dc[-1] < acc_dc[0]
    assert mrt_dc[-1] < mrt_dc[0]


def test_metrics_logger(tmp_path):
    from bayesflow_nddms_tpu.utils.profiling import MetricsLogger, Throughput
    log = MetricsLogger(str(tmp_path / "run.jsonl"))
    log.log(step=1, loss=3.0)
    log.log(step=2, loss=2.0)
    recs = log.read()
    assert [r["step"] for r in recs] == [1, 2]
    tp = Throughput()
    assert tp.update(100) is None
    assert tp.update(100) is not None and tp.total == 200


@pytest.mark.slow
def test_agreement_neutra_batched_tiny(monkeypatch):
    """--neutra now runs every selected dataset in ONE compiled NUTS
    program (per-chain ctx fan-out) for both families; mechanics test at
    a tiny budget."""
    monkeypatch.chdir("/root/repo")  # needs the trained checkpoints
    from bayesflow_nddms_tpu.apps.agreement import main
    s = main(["--model", "basic_ddm_dc", "--num-datasets", "3",
              "--only-datasets", "0,2", "--neutra",
              "--warmup", "20", "--samples", "6", "--chains", "2",
              "--max-depth", "3", "--chunk", "20", "--draws", "32",
              "--seed", "12",
              "--ckpt-dir", "trained/basic_ddm_dc_100k_r3c"])
    assert s["num_datasets"] == 2
    assert set(s["per_param"]) == {"drift", "alpha", "beta", "ter", "dc"}
    for v in s["per_param"].values():
        assert np.isfinite(v["mean_abs_dz"])

    s2 = main(["--model", "single_trial_alpha_not_scaled",
               "--num-datasets", "2", "--only-datasets", "1",
               "--marginal", "--per-dataset", "--neutra",
               "--warmup", "20", "--samples", "6", "--chains", "2",
               "--max-depth", "3", "--chunk", "20", "--draws", "32",
               "--n-quad", "8", "--seed", "11",
               "--ckpt-dir",
               "trained/single_trial_alpha_not_scaled_100k_r3c"])
    assert s2["num_datasets"] == 1
    for v in s2["per_param"].values():
        assert np.isfinite(v["mean_abs_dz"])
