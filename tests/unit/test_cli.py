"""CLI smoke tests — every entry runs end-to-end on tiny CPU workloads.

These guard the product surface (the reference's per-script UX) the same
way the unit tiers guard the math.
"""

import json
import os

import numpy as np
import pytest


def test_spectrum_cli(tmp_path, capsys):
    from hessian_llm_vision_tpu.cli import spectrum

    out = str(tmp_path / "spec")
    spectrum.main([
        "--model", "spiral", "--lanczos_iters", "8", "--batch_size", "30",
        "--num_points", "120", "--out_spectrum", out,
    ])
    assert os.path.exists(out + ".npz")
    assert "lambda_max" in capsys.readouterr().out


@pytest.mark.slow
def test_spectrum_cli_host_loop_and_compare(tmp_path, capsys):
    from hessian_llm_vision_tpu.cli import spectrum

    out = str(tmp_path / "spec")
    args = [
        "--model", "gpt2-tiny", "--lanczos_iters", "5", "--batch_size", "2",
        "--num_batches", "2", "--max_length", "16",
    ]
    spectrum.main(args + ["--host_loop", "--out_spectrum", out])
    spectrum.main(args + ["--host_loop", "--compare_to", out + ".npz"])
    out_text = capsys.readouterr().out
    assert "relative error" in out_text

    # with bases on both sides, --compare_to also reports subspace overlap
    outb = str(tmp_path / "specb")
    spectrum.main(args + ["--basis", "--out_spectrum", outb])
    spectrum.main(args + ["--basis", "--compare_to", outb + ".npz"])
    assert "subspace overlap" in capsys.readouterr().out


def test_spectrum_cli_layerwise(capsys):
    from hessian_llm_vision_tpu.cli import spectrum

    spectrum.main([
        "--model", "spiral", "--lanczos_iters", "4", "--batch_size", "30",
        "--num_points", "90", "--width", "8", "--depth", "1", "--layerwise",
    ])
    assert "P=" in capsys.readouterr().out


def test_train_cli_and_resume(tmp_path, capsys):
    from hessian_llm_vision_tpu.cli import train

    state = str(tmp_path / "st")
    loss1 = train.main([
        "--model", "spiral", "--optimiser", "sgd", "--lr", "0.3",
        "--epochs", "3", "--batch_size", "60", "--log_every", "100",
        "--out", str(tmp_path / "runs"), "--save_state", state,
    ])
    loss2 = train.main([
        "--model", "spiral", "--optimiser", "sgd", "--lr", "0.3",
        "--epochs", "3", "--batch_size", "60", "--log_every", "100",
        "--out", str(tmp_path / "runs"), "--resume_state", state,
    ])
    assert np.isfinite(loss1) and loss2 < loss1


def test_train_cli_lanczos(tmp_path):
    from hessian_llm_vision_tpu.cli import train

    loss = train.main([
        "--model", "spiral", "--optimiser", "lanczos", "--k", "4",
        "--lr", "0.02", "--epochs", "2", "--batch_size", "60",
        "--log_every", "100", "--out", str(tmp_path / "runs"),
    ])
    assert np.isfinite(loss)


def test_evaluate_cli(tmp_path, capsys):
    from hessian_llm_vision_tpu.cli import evaluate

    out = str(tmp_path / "l.pkl")
    evaluate.main([
        "--model", "spiral", "--batch_size", "30", "--out_losses", out,
    ])
    assert os.path.exists(out)
    assert "accuracy" in capsys.readouterr().out


def test_sweep_cli(tmp_path):
    from hessian_llm_vision_tpu.cli import sweep

    out = str(tmp_path / "sweep.json")
    results = sweep.main([
        "--grid", "lr=0.1,0.3", "--out_json", out, "--",
        "--model", "spiral", "--optimiser", "sgd", "--epochs", "1",
        "--batch_size", "60", "--log_every", "100",
        "--out", str(tmp_path / "runs"),
    ])
    assert len(results) == 2
    assert results[0]["final_loss"] <= results[1]["final_loss"]
    assert os.path.exists(out)


def test_hpo_cli(tmp_path):
    from hessian_llm_vision_tpu.cli import hpo

    out = str(tmp_path / "best.json")
    best = hpo.main([
        "--trials", "2", "--optimiser", "adam", "--out_json", out, "--",
        "--model", "spiral", "--epochs", "1", "--batch_size", "60",
        "--log_every", "100", "--out", str(tmp_path / "runs"),
    ])
    assert np.isfinite(best["loss"])
    with open(out) as f:
        assert "params" in json.load(f)


@pytest.mark.slow
def test_forget_cli(tmp_path):
    from hessian_llm_vision_tpu.cli import forget

    out = str(tmp_path / "curves.npz")
    base, proj = forget.main([
        "--model", "spiral", "--epochs_a", "40", "--epochs_b", "15",
        "--k", "4", "--lr", "0.5", "--width", "16", "--depth", "1",
        "--num_points", "90", "--out_curves", out,
    ])
    assert len(base) == 15 and len(proj) == 15
    with np.load(out) as z:
        assert "baseline_drop" in z and "method_results" in z
        # task-similarity diagnostic saved alongside the curves
        assert 0.0 <= float(z["ab_overlap"]) <= 1.0


@pytest.mark.slow
def test_forget_cli_thick_restart(tmp_path, capsys):
    """--thick_restart: the task-A basis from converged eigenpairs."""
    from hessian_llm_vision_tpu.cli import forget

    base, proj = forget.main([
        "--model", "spiral", "--epochs_a", "30", "--epochs_b", "5",
        "--k", "3", "--thick_restart", "--tr_inner", "10",
        "--lr", "0.5", "--width", "12",
        "--depth", "1", "--num_points", "60",
        "--out_curves", str(tmp_path / "c.npz"),
    ])
    out = capsys.readouterr().out
    assert "CONVERGED" in out
    assert len(base) == 5 and len(proj) == 5


def test_devices_info_cli(capsys):
    from hessian_llm_vision_tpu.cli import devices_info

    rows = devices_info.main(["--cpu"])
    assert len(rows) >= 1
    assert "backend" in capsys.readouterr().out


def test_spectrum_cli_ggn_and_fisher(capsys):
    from hessian_llm_vision_tpu.cli import spectrum

    for op in ("ggn", "fisher"):
        spec = spectrum.main([
            "--model", "spiral", "--operator", op, "--lanczos_iters", "8",
            "--batch_size", "30", "--num_points", "90", "--width", "8",
            "--depth", "1",
        ])
        ev = np.sort(np.asarray(spec.eigvals))
        assert ev[0] > -1e-4, f"{op} spectrum must be PSD, got {ev[0]}"


def test_spectrum_cli_rejects_unknown_operator():
    import pytest

    from hessian_llm_vision_tpu.cli import spectrum

    with pytest.raises(SystemExit):
        spectrum.main(["--model", "spiral", "--operator", "bogus",
                       "--lanczos_iters", "4", "--batch_size", "30"])


def test_train_cli_gn_and_ngd(tmp_path):
    from hessian_llm_vision_tpu.cli import train

    for opt in ("gn", "ngd"):
        loss = train.main([
            "--model", "spiral", "--optimiser", opt, "--lr", "0.5",
            "--damping", "0.1", "--epochs", "2", "--batch_size", "60",
            "--log_every", "100", "--out", str(tmp_path / "runs"),
        ])
        assert np.isfinite(loss), f"{opt} diverged"


def test_train_cli_spectrum_snapshots(tmp_path):
    import glob

    from hessian_llm_vision_tpu.cli import train

    loss = train.main([
        "--model", "spiral", "--optimiser", "adam", "--lr", "3e-3",
        "--epochs", "2", "--batch_size", "60", "--log_every", "100",
        "--snapshot_every", "8", "--snapshot_iters", "5",
        "--out", str(tmp_path / "runs"),
    ])
    assert np.isfinite(loss)
    snaps = glob.glob(str(tmp_path / "runs" / "**" / "T_step*.npz"),
                      recursive=True)
    assert len(snaps) >= 2
    from hessian_llm_vision_tpu.io import load_tridiag

    a, b = load_tridiag(snaps[0])
    assert a.shape == (5,) and b.shape == (4,)


def test_spectrum_cli_crash_resume(tmp_path):
    """Interrupted-then-resumed spectrum == uninterrupted spectrum."""
    from hessian_llm_vision_tpu.cli import spectrum

    base = ["--model", "spiral", "--batch_size", "30", "--num_points", "90",
            "--width", "8", "--depth", "1"]
    t = str(tmp_path / "T")
    full = spectrum.main(base + ["--lanczos_iters", "10",
                                 "--t_checkpoint", str(tmp_path / "Tf")])
    spectrum.main(base + ["--lanczos_iters", "4", "--t_checkpoint", t])
    resumed = spectrum.main(base + ["--lanczos_iters", "10",
                                    "--resume_spectrum", t + ".state.npz"])
    np.testing.assert_allclose(
        np.sort(np.asarray(resumed.eigvals)),
        np.sort(np.asarray(full.eigvals)),
        rtol=1e-5,
    )


def test_train_cli_adam_beta2_delta(tmp_path):
    from hessian_llm_vision_tpu.cli import train

    loss = train.main([
        "--model", "spiral", "--optimiser", "adam", "--lr", "0.01",
        "--beta2", "0.95", "--delta", "1e-6", "--epochs", "1",
        "--batch_size", "60", "--log_every", "100",
        "--out", str(tmp_path / "runs"),
    ])
    assert np.isfinite(loss)


@pytest.mark.slow
def test_train_cli_vision_augment_noise(tmp_path):
    from hessian_llm_vision_tpu.cli import train

    loss = train.main([
        "--model", "vgg16", "--optimiser", "sgd", "--lr", "0.01",
        "--epochs", "1", "--batch_size", "4", "--num_batches", "1",
        "--augment", "--noise", "0.1", "--log_every", "100",
        "--out", str(tmp_path / "runs"),
    ])
    assert np.isfinite(loss)


@pytest.mark.slow
def test_spectrum_cli_torch_format_roundtrip(tmp_path, capsys):
    from hessian_llm_vision_tpu.cli import spectrum

    out = str(tmp_path / "results.ckpt")
    spectrum.main([
        "--model", "spiral", "--lanczos_iters", "6", "--batch_size", "30",
        "--num_points", "120", "--basis", "--out_spectrum", out,
    ])
    assert os.path.exists(out)
    # our own reference-format reader consumes it (round-trip into the
    # reference ecosystem, gpt2_savehessian.py:216-235)
    from hessian_llm_vision_tpu.io import load_reference_spectrum

    spec = load_reference_spectrum(out)
    assert spec.eigvals.shape == (6,) and spec.ritz_vectors is not None
    # and --compare_to matches itself exactly
    spectrum.main([
        "--model", "spiral", "--lanczos_iters", "6", "--batch_size", "30",
        "--num_points", "120", "--compare_to", out,
    ])
    assert "relative error" in capsys.readouterr().out


def test_spectrum_cli_state_every(tmp_path, capsys):
    from hessian_llm_vision_tpu.cli import spectrum
    import glob

    t = str(tmp_path / "T")
    spectrum.main([
        "--model", "spiral", "--lanczos_iters", "7", "--batch_size", "30",
        "--num_points", "120", "--t_checkpoint", t, "--state_every", "3",
    ])
    # T saved (tiny, every iter); full state exists (throttled writes)
    assert os.path.exists(t + ".npz") and os.path.exists(t + ".state.npz")


def test_train_cli_lanczos_host(tmp_path):
    """Host-orchestrated LanczosSGD end-to-end through the CLI, bf16 basis,
    save + resume of the host state."""
    from hessian_llm_vision_tpu.cli import train

    state = str(tmp_path / "hoststate")
    common = [
        "--model", "spiral", "--optimiser", "lanczos-host", "--k", "4",
        "--refresh_every", "2", "--lr", "0.05", "--batch_size", "60",
        "--basis_bf16", "--log_every", "100", "--out", str(tmp_path / "runs"),
    ]
    loss1 = train.main(common + ["--epochs", "2", "--save_state", state])
    assert np.isfinite(loss1)
    loss2 = train.main(common + ["--epochs", "2", "--resume_state", state])
    assert np.isfinite(loss2) and loss2 <= loss1 + 0.05


@pytest.mark.slow
def test_spectrum_cli_llama(capsys):
    from hessian_llm_vision_tpu.cli import spectrum

    spectrum.main([
        "--model", "llama-tiny", "--lanczos_iters", "4", "--batch_size", "2",
        "--num_batches", "1", "--max_length", "16",
    ])
    assert "lambda_max" in capsys.readouterr().out


def test_train_cli_lanczos_layer_host(tmp_path):
    """Host-orchestrated LAYER-WISE LanczosSGD through the CLI."""
    from hessian_llm_vision_tpu.cli import train

    loss = train.main([
        "--model", "spiral", "--optimiser", "lanczos-layer-host", "--k", "3",
        "--refresh_every", "2", "--lr", "0.05", "--batch_size", "60",
        "--epochs", "2", "--log_every", "100", "--out", str(tmp_path / "runs"),
    ])
    assert np.isfinite(loss)


def test_spectrum_cli_thick_restart(tmp_path, capsys):
    """--thick_restart K: converged extremal eigenpairs inside a fixed
    basis buffer; gammas are the probe's weights on converged vectors."""
    from hessian_llm_vision_tpu.cli import spectrum

    out = str(tmp_path / "tr")
    spec = spectrum.main([
        "--model", "spiral", "--lanczos_iters", "16", "--batch_size", "30",
        "--num_points", "90", "--width", "8", "--depth", "1",
        "--thick_restart", "4", "--basis", "--out_spectrum", out, "--cpu",
    ])
    assert "converged" in capsys.readouterr().out
    assert spec.eigvals.shape == (4,)
    assert spec.ritz_vectors is not None and spec.ritz_vectors.shape[0] == 4
    assert os.path.exists(out + ".npz")
    with pytest.raises(SystemExit):
        spectrum.main([
            "--model", "spiral", "--batch_size", "30", "--num_points", "90",
            "--thick_restart", "4", "--host_loop", "--cpu",
        ])


@pytest.mark.slow
def test_spectrum_cli_layerwise_block(tmp_path, capsys):
    """--layerwise_group block: one spectrum per transformer block h_i, the
    visual-eigen.ipynb cell-12 sweep + cell-13 grid plot, both paths."""
    from hessian_llm_vision_tpu.cli import spectrum

    plot = str(tmp_path / "grid.png")
    args = [
        "--model", "gpt2-tiny", "--lanczos_iters", "4", "--batch_size", "2",
        "--num_batches", "1", "--max_length", "16",
        "--layerwise", "--layerwise_group", "block", "--plot", plot,
        "--out_spectrum", str(tmp_path / "blk"),
    ]
    res = spectrum.main(args)
    assert set(res) == {"h_0", "h_1"}  # embeddings/head skipped, as cell 12
    assert os.path.exists(plot)
    assert os.path.exists(str(tmp_path / "blk_h_0.npz"))
    res_host = spectrum.main(args[:-4] + ["--host_loop"])
    assert set(res_host) == {"h_0", "h_1"}
    for k in res:
        lam = float(np.max(np.asarray(res[k].eigvals)))
        lam_h = float(np.max(np.asarray(res_host[k].eigvals)))
        assert np.isfinite(lam) and np.isfinite(lam_h)


def test_spectrum_cli_layerwise_host_loop(capsys):
    """--layerwise --host_loop: one masked-HVP program for every leaf."""
    from hessian_llm_vision_tpu.cli import spectrum

    res = spectrum.main([
        "--model", "spiral", "--lanczos_iters", "4", "--batch_size", "30",
        "--num_points", "90", "--width", "8", "--depth", "1",
        "--layerwise", "--host_loop",
    ])
    out = capsys.readouterr().out
    assert "P=" in out and len(res) >= 4


def test_spectrum_cli_ggn_host_loop(capsys):
    """--operator ggn --host_loop: GGN spectrum through the LLM-scale host
    path (colaexp.py GN spectra at any scale the Hessian path reaches)."""
    from hessian_llm_vision_tpu.cli import spectrum

    spectrum.main([
        "--model", "gpt2-tiny", "--lanczos_iters", "6", "--batch_size", "2",
        "--num_batches", "2", "--max_length", "16",
        "--operator", "ggn", "--host_loop",
    ])
    out_text = capsys.readouterr().out
    assert "lambda_max" in out_text


def test_spectrum_cli_hvp_precision_default(capsys):
    """--hvp_precision default runs the host loop at bf16x1 (no-op on the
    CPU test backend; the knob's speed/accuracy tradeoff is measured on
    TPU — see README round-2 table)."""
    from hessian_llm_vision_tpu.cli import spectrum

    spectrum.main([
        "--model", "gpt2-tiny", "--lanczos_iters", "5", "--batch_size", "2",
        "--num_batches", "2", "--max_length", "16",
        "--host_loop", "--hvp_precision", "default",
    ])
    assert "lambda_max" in capsys.readouterr().out


def test_wikipedia_fallback_is_loud_by_default():
    """Offline hub failure must be an error, not silent noise-training,
    unless --allow_fallback (VERDICT r2 weak #5)."""
    from hessian_llm_vision_tpu.cli import common
    from hessian_llm_vision_tpu.cli.spectrum import build_parser

    base = ["--model", "gpt2-tiny", "--dataset", "wikipedia",
            "--batch_size", "2", "--max_length", "16", "--cpu"]
    with pytest.raises(SystemExit):
        common.build_workload(build_parser().parse_args(base))
    wl = common.build_workload(
        build_parser().parse_args(base + ["--allow_fallback"])
    )
    assert len(wl.batches) >= 1  # seeded random tokens


def test_local_corpus_num_batches_cap(tmp_path):
    """--num_batches caps local:<path> corpora (ADVICE r2: flag semantics
    consistent across datasets)."""
    from hessian_llm_vision_tpu.cli import common
    from hessian_llm_vision_tpu.cli.spectrum import build_parser

    big = tmp_path / "corpus.txt"
    big.write_text("the quick brown fox jumps over the lazy dog. " * 400)
    base = ["--model", "gpt2-tiny", "--dataset", f"local:{tmp_path}",
            "--batch_size", "2", "--max_length", "16", "--cpu"]
    wl_all = common.build_workload(build_parser().parse_args(base))
    wl_cap = common.build_workload(
        build_parser().parse_args(base + ["--num_batches", "3"])
    )
    assert len(wl_all.batches) > 3
    assert len(wl_cap.batches) == 3


@pytest.mark.slow
def test_spectrum_cli_host_loop_multiprobe(tmp_path, capsys):
    """--host_loop --probes N: the d.sh seed grid in-process (the path the
    124M artifacts/slq_multiprobe_r3 run used).  Checks the SLQ-averaging
    contract: probes x iters Ritz pairs, weights averaged over probes
    (sum to 1), per-probe extreme Ritz values printed and consistent."""
    from hessian_llm_vision_tpu.cli import spectrum

    out = str(tmp_path / "spec")
    spectrum.main([
        "--model", "gpt2-tiny", "--lanczos_iters", "6", "--batch_size", "2",
        "--num_batches", "2", "--max_length", "16",
        "--host_loop", "--probes", "3", "--out_spectrum", out,
    ])
    text = capsys.readouterr().out
    assert "probe 1/3" in text and "probe 3/3" in text
    d = np.load(out + ".npz")
    ev, ga = d["eigvals"], d["gammas"]
    assert ev.shape == (3 * 6,)
    np.testing.assert_allclose(ga.sum(), 1.0, atol=1e-5)
    # per-probe SLQ weights each sum to 1/probes (averaged, not renormalized)
    per_probe_ga = [ga[i * 6:(i + 1) * 6].sum() for i in range(3)]
    np.testing.assert_allclose(per_probe_ga, 1.0 / 3, atol=1e-5)
    # (probe-to-probe extreme-Ritz agreement is a CONVERGENCE property, not
    # a contract — at 6 iters a probe may not reach lambda_max; the at-scale
    # agreement is pinned by tests/golden/test_multiprobe_artifact.py)


def test_package_main_dispatch(tmp_path, capsys):
    """python -m hessian_llm_vision_tpu <cmd>: help map + dispatch + errors."""
    from hessian_llm_vision_tpu.__main__ import main

    assert main([]) == 0
    text = capsys.readouterr().out
    for cmd in ("train", "spectrum", "forget", "sweep", "hpo"):
        assert cmd in text
    assert main(["no-such-command"]) == 2
    out = str(tmp_path / "spec")
    assert main(["spectrum", "--model", "spiral", "--lanczos_iters", "4",
                 "--batch_size", "30", "--num_points", "120",
                 "--out_spectrum", out]) == 0
    assert os.path.exists(out + ".npz")


def test_spectrum_cli_hutchpp(capsys):
    """--hutchpp M prints a Hutch++ trace estimate; on the spiral problem
    it must agree with the SLQ full-rank trace to a few percent."""
    import re

    from hessian_llm_vision_tpu.cli import spectrum

    spectrum.main([
        "--model", "spiral", "--lanczos_iters", "8", "--batch_size", "30",
        "--num_points", "120", "--hutchpp", "24",
    ])
    out = capsys.readouterr().out
    m = re.search(r"trace \(hutch\+\+ 24 matvecs\) = ([-\d.e+]+)", out)
    assert m, out
    assert np.isfinite(float(m.group(1)))


def test_spectrum_cli_kpm(tmp_path, capsys):
    """--kpm M prints a KPM density summary and persists the moments in
    the npz (meta_kpm_*); the KPM trace agrees with the SLQ one."""
    import re

    from hessian_llm_vision_tpu.cli import spectrum

    out_npz = str(tmp_path / "spec")
    spectrum.main([
        "--model", "spiral", "--lanczos_iters", "8", "--batch_size", "30",
        "--num_points", "120", "--kpm", "32", "--kpm_probes", "2",
        "--out_spectrum", out_npz,
    ])
    out = capsys.readouterr().out
    m = re.search(r"E\[lambda\] = ([-\d.e+]+)", out)
    assert m and np.isfinite(float(m.group(1)))
    with np.load(out_npz + ".npz") as z:
        assert z["meta_kpm_moments"].shape == (32,)
        assert float(z["meta_kpm_raw_moments"][0]) == pytest.approx(1.0, rel=1e-3)
        assert float(z["meta_kpm_radius"]) > 0


def test_spectrum_cli_kpm_host_loop(tmp_path, capsys):
    """--kpm under --host_loop (the LLM-scale path artifacts/kpm124m_r3
    uses): the dataset Hessian's program-backed matvec feeds KPM; the
    moments land in the npz exactly as on the in-core path."""
    import re

    from hessian_llm_vision_tpu.cli import spectrum

    out_npz = str(tmp_path / "spec_hl")
    spectrum.main([
        "--model", "spiral", "--lanczos_iters", "6", "--batch_size", "30",
        "--num_points", "120", "--kpm", "24", "--kpm_probes", "2",
        "--host_loop", "--out_spectrum", out_npz,
    ])
    out = capsys.readouterr().out
    m = re.search(r"E\[lambda\] = ([-\d.e+]+)", out)
    assert m and np.isfinite(float(m.group(1)))
    with np.load(out_npz + ".npz") as z:
        assert z["meta_kpm_moments"].shape == (24,)
        assert float(z["meta_kpm_raw_moments"][0]) == pytest.approx(1.0, rel=1e-3)
        assert float(z["meta_kpm_radius"]) > 0


def test_spectrum_cli_kpm_deflate(tmp_path, capsys):
    """--kpm M --kpm_deflate K: exact extremal spikes (thick restart) +
    KPM bulk on the deflated operator; bulk range is tighter than the
    full-support --kpm range; spikes land in the npz."""
    import re

    from hessian_llm_vision_tpu.cli import spectrum

    out_npz = str(tmp_path / "spec_defl")
    spectrum.main([
        "--model", "spiral", "--lanczos_iters", "8", "--batch_size", "30",
        "--num_points", "120", "--kpm", "24", "--kpm_probes", "2",
        "--kpm_deflate", "2", "--out_spectrum", out_npz,
    ])
    out = capsys.readouterr().out
    m = re.search(r"combined E\[lambda\] = ([-\d.e+]+)", out)
    assert m and np.isfinite(float(m.group(1)))
    assert "deflated 2 extremal pairs" in out
    with np.load(out_npz + ".npz") as z:
        spikes = z["meta_kpm_deflate_eigvals"]
        assert spikes.shape == (2,)
        assert z["meta_kpm_moments"].shape == (24,)
        # the spikes are the extremal |lambda| pairs: outside the bulk
        bulk_hi = float(z["meta_kpm_center"]) + float(z["meta_kpm_radius"])
        bulk_lo = float(z["meta_kpm_center"]) - float(z["meta_kpm_radius"])
        assert np.abs(spikes).max() >= bulk_hi - 1e-6
        # bulk support is a strict subset of the full spectral range
        assert bulk_hi - bulk_lo < 2.0 * np.abs(spikes).max()


def test_loud_flag_combinations():
    """Silently-dropped flag combos are errors (code-review r3)."""
    from hessian_llm_vision_tpu.cli import spectrum

    base = ["--model", "spiral", "--lanczos_iters", "3", "--batch_size",
            "16", "--num_points", "60", "--cpu"]
    with pytest.raises(SystemExit):
        spectrum.main(base + ["--hutchpp", "9", "--host_loop"])
    # --kpm + --host_loop is now supported for the hessian operator only
    with pytest.raises(SystemExit):
        spectrum.main(base + ["--kpm", "16", "--host_loop",
                              "--operator", "ggn"])
    with pytest.raises(SystemExit):
        spectrum.main(base + ["--kpm", "16", "--host_loop", "--bigmodel"])
    with pytest.raises(SystemExit):
        spectrum.main(base + ["--kpm", "16", "--thick_restart", "3"])
    with pytest.raises(SystemExit):
        spectrum.main(base + ["--kpm_probes", "8"])
    with pytest.raises(SystemExit):
        spectrum.main(base + ["--kpm_deflate", "2"])
    # --host_loop is T-only: a silently-dropped --basis/--host_basis would
    # write ritz_vectors=None npz with no error (code-review r3)
    with pytest.raises(SystemExit):
        spectrum.main(base + ["--host_loop", "--basis"])
    with pytest.raises(SystemExit):
        spectrum.main(base + ["--host_loop", "--host_basis"])
    with pytest.raises(SystemExit):
        spectrum.main(base + ["--qprev_bf16"])
    # --layerwise ignores probe/basis/checkpoint/compare/operator machinery
    for extra in (["--probes", "3"], ["--basis"], ["--t_checkpoint", "/tmp/t"],
                  ["--compare_to", "/tmp/x.npz"], ["--operator", "ggn"]):
        with pytest.raises(SystemExit):
            spectrum.main(base + ["--layerwise"] + extra)
    # orphan sub-flags without their parent flag are errors too
    with pytest.raises(SystemExit):
        spectrum.main(base + ["--tr_dtype", "bfloat16"])
    with pytest.raises(SystemExit):
        spectrum.main(base + ["--layerwise_group", "block"])
    with pytest.raises(SystemExit):
        spectrum.main(base + ["--thick_restart", "3", "--hutchpp", "8"])
    # block grouping that matches nothing is loud in BOTH layerwise paths
    with pytest.raises(SystemExit):
        spectrum.main(base + ["--layerwise", "--layerwise_group", "block"])
    with pytest.raises(SystemExit):
        spectrum.main(base + ["--layerwise", "--layerwise_group", "block",
                              "--host_loop"])


@pytest.mark.slow
def test_host_loop_single_iteration():
    """num_iters=1 must return a valid T in all three host-loop variants
    (empty-betas guard; the fused/bigmodel >1B paths crashed here)."""
    from hessian_llm_vision_tpu.cli import spectrum

    spec = spectrum.main([
        "--model", "spiral", "--lanczos_iters", "1", "--batch_size", "16",
        "--num_points", "60", "--host_loop", "--cpu",
    ])
    assert spec.eigvals.shape == (1,)
    lm = ["--model", "gpt2-tiny", "--lanczos_iters", "1", "--batch_size",
          "2", "--max_length", "16", "--num_batches", "1", "--host_loop",
          "--cpu"]
    assert spectrum.main(lm + ["--fused_step"]).eigvals.shape == (1,)
    assert spectrum.main(lm + ["--bigmodel"]).eigvals.shape == (1,)


def test_vision_num_batches_zero_means_uncapped():
    """--num_batches 0 = no cap (matches the LM local-corpus semantics),
    never an empty workload."""
    from hessian_llm_vision_tpu.cli import common
    from hessian_llm_vision_tpu.cli.spectrum import build_parser

    wl = common.build_workload(build_parser().parse_args([
        "--model", "simplenet", "--num_batches", "0", "--batch_size", "8",
        "--subsample", "0.01", "--cpu",
    ]))
    assert len(wl.batches) >= 1


@pytest.mark.slow
def test_spectrum_cli_fused_iter(tmp_path, capsys):
    """--host_loop --fused_iter (one program per iteration) matches the
    unfused host loop's spectrum, and the loud-flag preconditions fire."""
    from hessian_llm_vision_tpu.cli import spectrum

    out_u = str(tmp_path / "spec_u")
    out_f = str(tmp_path / "spec_f")
    args = [
        "--model", "gpt2-tiny", "--lanczos_iters", "5", "--batch_size", "2",
        "--num_batches", "2", "--max_length", "16",
    ]
    spectrum.main(args + ["--host_loop", "--out_spectrum", out_u])
    spectrum.main(
        args + ["--host_loop", "--fused_iter", "--out_spectrum", out_f]
    )
    du = np.load(out_u + ".npz")
    df = np.load(out_f + ".npz")
    np.testing.assert_allclose(
        np.sort(du["eigvals"])[-1], np.sort(df["eigvals"])[-1], rtol=1e-4
    )

    with pytest.raises(SystemExit, match="fused_iter"):
        spectrum.main(args + ["--fused_iter"])
    with pytest.raises(SystemExit, match="host_loop"):
        spectrum.main(args[:2] + ["--bigmodel", "--num_batches", "1"])


@pytest.mark.slow
def test_spectrum_cli_precision_check(tmp_path, capsys):
    """--precision_check prints the probe line on every path, including the
    mixed-mode referee rebuild (block_matmul_precision=None arm)."""
    from hessian_llm_vision_tpu.cli import spectrum

    out = str(tmp_path / "spec")
    args = [
        "--model", "gpt2-tiny", "--lanczos_iters", "4", "--batch_size", "2",
        "--num_batches", "2", "--max_length", "16", "--precision_check",
    ]
    spectrum.main(args + ["--host_loop", "--out_spectrum", out])
    out_text = capsys.readouterr().out
    assert "[precision] HVP extreme-Ritz rel err vs f32 referee" in out_text
    assert os.path.exists(out + ".npz")

    # mixed mode: the referee arm rebuilds the model without the baked-in
    # block precision; on CPU every precision is f32 so no warning fires
    spectrum.main(args + ["--hvp_precision", "mixed",
                          "--precision_check_iters", "3"])
    captured = capsys.readouterr()
    assert "[precision] HVP extreme-Ritz rel err vs f32 referee (3 iters)" in captured.out
    assert "WARNING" not in captured.err

    # loud-flags policy
    import pytest
    with pytest.raises(SystemExit):
        spectrum.main([
            "--model", "spiral", "--lanczos_iters", "4",
            "--precision_check_iters", "3",
        ])
    with pytest.raises(SystemExit):  # iters must be >= 1 (ritz gate needs T)
        spectrum.main(args + ["--precision_check_iters", "0"])
    with pytest.raises(SystemExit):  # GGN runs a different matvec program
        spectrum.main([
            "--model", "spiral", "--operator", "ggn", "--lanczos_iters", "4",
            "--batch_size", "30", "--precision_check",
        ])


@pytest.mark.slow
def test_train_cli_precision_check(tmp_path, capsys):
    """--precision_check probes the refresh precision before training (host
    trainers only; loud error elsewhere)."""
    from hessian_llm_vision_tpu.cli import train

    common = [
        "--model", "spiral", "--optimiser", "lanczos-host", "--k", "3",
        "--refresh_every", "2", "--lr", "0.05", "--batch_size", "60",
        "--log_every", "100", "--out", str(tmp_path / "runs"),
        "--epochs", "1", "--precision_check",
    ]
    loss = train.main(common)
    assert np.isfinite(loss)
    captured = capsys.readouterr()
    assert "[precision] refresh extreme-Ritz rel err vs f32 referee" in captured.out
    # CPU matmuls are f32 at every named precision: no warning
    assert "WARNING" not in captured.err

    # the probe runs AFTER --resume_state (it must see the params training
    # starts from) and mirrors the refresh batch plan under accumulation
    state = str(tmp_path / "pstate")
    train.main(common + ["--save_state", state])
    capsys.readouterr()
    loss_r = train.main(common + ["--resume_state", state,
                                  "--refresh_batch_size", "2"])
    assert np.isfinite(loss_r)
    out_r = capsys.readouterr().out
    resumed_at = out_r.index("resumed train state")
    probe_at = out_r.index("[precision] refresh")
    assert probe_at > resumed_at

    import pytest
    with pytest.raises(SystemExit):
        train.main([
            "--model", "spiral", "--optimiser", "adam", "--epochs", "1",
            "--precision_check", "--out", str(tmp_path / "runs2"),
        ])


@pytest.mark.slow
def test_spectrum_cli_moe(tmp_path, capsys):
    """--experts / gpt2-moe: MoE spectra from the CLI (models/moe.py)."""
    from hessian_llm_vision_tpu.cli import spectrum

    out = str(tmp_path / "moespec")
    spectrum.main([
        "--model", "gpt2-tiny", "--experts", "4", "--lanczos_iters", "4",
        "--batch_size", "2", "--num_batches", "1", "--max_length", "16",
        "--out_spectrum", out,
    ])
    assert os.path.exists(out + ".npz")
    assert "lambda_max" in capsys.readouterr().out

    # loud-flags policy: --experts on a non-gpt2 model is an error
    with pytest.raises(SystemExit):
        spectrum.main([
            "--model", "spiral", "--experts", "4", "--lanczos_iters", "2",
        ])


def test_ghost_cluster_warning(capsys):
    """A near-identical top-3 Ritz cluster (the lost-orthogonality
    signature measured on the trained 124M checkpoint) must trip the
    report's ghost warning; a genuinely spread spectrum must not."""
    import argparse

    import jax.numpy as jnp

    from hessian_llm_vision_tpu.cli.spectrum import _report_and_outputs
    from hessian_llm_vision_tpu.krylov.slq import Spectrum

    def make_args():
        return argparse.Namespace(
            lanczos_iters=5, out_spectrum=None, plot=None, compare_to=None,
            subsample=1.0, vector_seed=0, hutchpp=None,
        )

    ghost = Spectrum(
        eigvals=jnp.asarray([1.0, 2.0, 1.57e6, 1.5700001e6, 1.5700002e6]),
        gammas=jnp.full((5,), 0.2),
    )
    _report_and_outputs(make_args(), ghost, 1.0, 100, 1)
    out = capsys.readouterr().out
    assert "LOST ORTHOGONALITY" in out and "--thick_restart" in out

    healthy = Spectrum(
        eigvals=jnp.asarray([-2.0, -1.0, 1.0, 2.0, 4.8]),
        gammas=jnp.full((5,), 0.2),
    )
    _report_and_outputs(make_args(), healthy, 1.0, 100, 1)
    assert "LOST ORTHOGONALITY" not in capsys.readouterr().out


def test_block_precision_accepts_dot_algorithm_presets(tmp_path):
    """--block_precision must accept jax dot-algorithm preset names (the
    trained-checkpoint faithful tier is blocks BF16_BF16_F32_X6) — the
    choices list that rejected them cost a round-5 TPU block sweep."""
    from hessian_llm_vision_tpu.cli.spectrum import build_parser

    args = build_parser().parse_args(
        ["--block_precision", "BF16_BF16_F32_X6"]
    )
    assert args.block_precision == "BF16_BF16_F32_X6"
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--block_precision", "bogus"])
