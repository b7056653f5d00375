"""RiskScorer serving-layer tests (library level; the HTTP endpoint is a
thin handler over this, driven manually in round-1 verification)."""

import numpy as np
import pytest

from multimodal_survival_prediction_tpu.config import RNASEQ_ONLY
from multimodal_survival_prediction_tpu.data.synthetic import (
    SyntheticCohortSpec,
    generate_synthetic_cohort,
)
from multimodal_survival_prediction_tpu.serving import RiskScorer
from multimodal_survival_prediction_tpu.train.cv import run_cross_validation


@pytest.fixture(scope="module")
def models_dir(tmp_path_factory):
    td = tmp_path_factory.mktemp("serve")
    table, paths = generate_synthetic_cohort(
        td, SyntheticCohortSpec(n_patients=30, rna_dim=80, seed=11,
                                p_rnaseq=0.95))
    run_cross_validation(
        RNASEQ_ONLY.with_overrides(n_folds=2), table,
        rnaseq_csv=paths["rnaseq_csv"], results_dir=td / "results",
        models_dir=td / "models", num_epochs=2)
    return td / "models"


@pytest.fixture(scope="module")
def checkpoint(models_dir):
    return models_dir / "rnaseq_only" / "fold_1_best.msgpack"


def test_scorer_roundtrip(checkpoint):
    scorer = RiskScorer("rnaseq_only", checkpoint, rna_dim=80)
    rng = np.random.default_rng(0)
    out = scorer.score(rnaseq=rng.normal(size=80), age=60)
    assert np.isfinite(out["risk_score"])
    assert out["modalities_used"] == {"image": False, "rnaseq": True,
                                      "clinical": True}
    # deterministic: same input -> same score
    out2 = scorer.score(rnaseq=rng.normal(size=80))
    out3 = scorer.score(rnaseq=rng.normal(size=80))
    assert out2["risk_score"] != out["risk_score"]  # different inputs differ


def test_scorer_rejects_bad_inputs(checkpoint):
    scorer = RiskScorer("rnaseq_only", checkpoint, rna_dim=80)
    with pytest.raises(ValueError, match="80 genes"):
        scorer.score(rnaseq=np.zeros(7))
    with pytest.raises(ValueError, match="at least one modality"):
        scorer.score()


def test_scorer_fold_ensemble(models_dir):
    from multimodal_survival_prediction_tpu.train.predict import (
        fold_checkpoints,
    )

    ckpts = fold_checkpoints(models_dir, "rnaseq_only")
    assert len(ckpts) == 2
    singles = [RiskScorer("rnaseq_only", c, rna_dim=80) for c in ckpts]
    ens = RiskScorer("rnaseq_only", ckpts, rna_dim=80)
    rng = np.random.default_rng(4)
    x = rng.normal(size=80)
    per_fold = [s.score(rnaseq=x)["risk_score"] for s in singles]
    out = ens.score(rnaseq=x)
    # uncalibrated ensemble = plain mean of the per-fold log-hazards
    assert out["risk_score"] == pytest.approx(np.mean(per_fold), abs=1e-5)
    assert out["ensemble_folds"] == 2

    # calibrated: per-fold z-score with supplied (mu, sd) before averaging
    cal = [(0.5, 2.0), (-0.25, 0.5)]
    ens_cal = RiskScorer("rnaseq_only", ckpts, rna_dim=80,
                         fold_calibration=cal)
    expect = np.mean([(per_fold[0] - 0.5) / (2.0 + 1e-8),
                      (per_fold[1] + 0.25) / (0.5 + 1e-8)])
    assert ens_cal.score(rnaseq=x)["risk_score"] == pytest.approx(
        expect, abs=1e-5)

    with pytest.raises(ValueError, match="fold_calibration"):
        RiskScorer("rnaseq_only", ckpts, rna_dim=80,
                   fold_calibration=[(0.0, 1.0)])

    # calibration must also apply to a SINGLE checkpoint (a caller who
    # supplies (mu, sd) gets z-scored output, never a silently raw hazard)
    single_cal = RiskScorer("rnaseq_only", ckpts[0], rna_dim=80,
                            fold_calibration=[(0.5, 2.0)])
    assert single_cal.score(rnaseq=x)["risk_score"] == pytest.approx(
        (per_fold[0] - 0.5) / (2.0 + 1e-8), abs=1e-5)


def test_http_server_contract(models_dir):
    """The HTTP layer (serving.make_server) — request/response contract for
    /healthz, /score, bad input (400), and unknown paths (404)."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from multimodal_survival_prediction_tpu.serving import make_server

    scorer = RiskScorer(
        "rnaseq_only", models_dir / "rnaseq_only" / "fold_1_best.msgpack",
        rna_dim=80)
    server = make_server(scorer, port=0)  # OS-assigned port
    host, port = server.server_address
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://{host}:{port}"
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.load(r)["status"] == "ok"

        body = json.dumps(
            {"rnaseq": [0.1] * 80, "age": 61}).encode()
        with urllib.request.urlopen(
                urllib.request.Request(f"{base}/score", data=body),
                timeout=60) as r:
            out = json.load(r)
        assert np.isfinite(out["risk_score"])
        assert out["modalities_used"]["rnaseq"] is True

        with pytest.raises(urllib.error.HTTPError) as e400:
            urllib.request.urlopen(
                urllib.request.Request(
                    f"{base}/score",
                    data=json.dumps({"rnaseq": [1.0] * 3}).encode()),
                timeout=30)
        assert e400.value.code == 400
        assert "genes" in json.load(e400.value)["error"]

        with pytest.raises(urllib.error.HTTPError) as e404:
            urllib.request.urlopen(f"{base}/nope", timeout=30)
        assert e404.value.code == 404

        # batch endpoint: N patients in one request
        bbody = json.dumps({"patients": [
            {"rnaseq": [0.1] * 80}, {"rnaseq": [0.3] * 80, "age": 70},
        ]}).encode()
        with urllib.request.urlopen(
                urllib.request.Request(f"{base}/score_batch", data=bbody),
                timeout=60) as r:
            batch_out = json.load(r)["results"]
        assert len(batch_out) == 2
        assert all(np.isfinite(b["risk_score"]) for b in batch_out)
        assert batch_out[0]["modalities_used"]["clinical"] is False
        assert batch_out[1]["modalities_used"]["clinical"] is True

        # well-formed JSON of the wrong SHAPE is a client error (400)
        for path, bad in (("/score", b"[1, 2]"),
                          ("/score_batch", b'{"patients": ["x"]}')):
            with pytest.raises(urllib.error.HTTPError) as eshape:
                urllib.request.urlopen(
                    urllib.request.Request(f"{base}{path}", data=bad),
                    timeout=30)
            assert eshape.value.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_scorer_meta_inference(checkpoint):
    """RiskScorer infers rna_dim/backbone/image_shape from the checkpoint's
    .meta.json when not explicitly given."""
    scorer = RiskScorer("rnaseq_only", checkpoint)  # no rna_dim argument
    assert scorer.rna_dim == 80
    out = scorer.score(rnaseq=np.zeros(80))
    assert np.isfinite(out["risk_score"])


def test_score_many_matches_singles(checkpoint):
    """Micro-batched scoring (one dispatch per batch_size chunk) must equal
    one-at-a-time scoring, including across chunk boundaries."""
    scorer4 = RiskScorer("rnaseq_only", checkpoint, batch_size=4)
    scorer1 = RiskScorer("rnaseq_only", checkpoint)
    rng = np.random.default_rng(7)
    patients = [dict(rnaseq=rng.normal(size=80)) for _ in range(6)]
    patients[2]["age"] = 70.0
    many = scorer4.score_many(patients)
    singles = [scorer1.score(**p) for p in patients]
    assert len(many) == 6
    for m, s in zip(many, singles):
        assert m["risk_score"] == pytest.approx(s["risk_score"], abs=1e-5)
        assert m["modalities_used"] == s["modalities_used"]


def test_no_image_variant_matches_full(tmp_path):
    """The image-less program (zero image constant-folded on device, no
    zero-plane transfer) must produce exactly the full program's scores on a
    real IMAGE model — the zero image still flows through the CT encoder
    before masking (reference order, SURVEY §7) — and a request WITH a
    volume must route back to the full program."""
    from multimodal_survival_prediction_tpu.config import PARTIAL_MODALITY

    spec = SyntheticCohortSpec(n_patients=14, rna_dim=40, seed=6,
                               p_imaging=1.0, image_shapes=((20, 24, 24),))
    table, paths = generate_synthetic_cohort(tmp_path, spec)
    cfg = PARTIAL_MODALITY.with_overrides(n_folds=2, batch_size=4,
                                          image_shape=(16, 16, 8))
    run_cross_validation(
        cfg, table, rnaseq_csv=paths["rnaseq_csv"],
        results_dir=tmp_path / "r", models_dir=tmp_path / "m",
        num_epochs=1, backbone="simple_cnn")
    ckpt = tmp_path / "m" / "partial_modality" / "fold_1_best.msgpack"

    plain = RiskScorer("partial_modality", ckpt, batch_size=2)
    fast = RiskScorer("partial_modality", ckpt, batch_size=2,
                      no_image_variant=True)
    assert fast._no_image_ready and not plain._no_image_ready
    rng = np.random.default_rng(12)
    patients = [dict(rnaseq=rng.normal(size=40), age=60.0)
                for _ in range(3)]
    a = plain.score_many(patients)
    b = fast.score_many(patients)
    for x, y in zip(a, b):
        assert x["risk_score"] == pytest.approx(y["risk_score"], abs=1e-6)

    # with a volume, both scorers use the full program and still agree
    vol = rng.normal(100, 50, size=(20, 24, 24)).astype(np.float32)
    pa = plain.score(volume=vol, age=55.0)
    pb = fast.score(volume=vol, age=55.0)
    assert pa["modalities_used"]["image"] is True
    assert pa["risk_score"] == pytest.approx(pb["risk_score"], abs=1e-6)
    assert pa["risk_score"] != pytest.approx(a[0]["risk_score"], abs=1e-6)


def test_scorer_matches_predict_risk_oracle(models_dir, tmp_path):
    """Cross-path oracle: RiskScorer's packed-input program must reproduce
    predict_risk's score for the same patient — guards the packed column
    layout against systematic (self-consistent) unpack bugs."""
    import pandas as pd

    from multimodal_survival_prediction_tpu.data.datasets import (
        load_rnaseq_matrix,
    )
    from multimodal_survival_prediction_tpu.train.predict import predict_risk

    # rebuild the cohort the fixture trained on
    root = models_dir.parent
    table = pd.read_csv(
        root / "data" / "processed" / "full_matching_table.csv")
    rnaseq_csv = root / "data" / "processed" / "rnaseq_normalized_mapped.csv"
    ckpt = models_dir / "rnaseq_only" / "fold_1_best.msgpack"
    pred = predict_risk(RNASEQ_ONLY, ckpt, table, rnaseq_csv=rnaseq_csv)

    rna = load_rnaseq_matrix(rnaseq_csv)
    scorer = RiskScorer("rnaseq_only", ckpt)
    pid = pred.patient_id.iloc[0]
    out = scorer.score(rnaseq=rna.loc[pid].to_numpy())
    assert out["risk_score"] == pytest.approx(
        float(pred.risk_score.iloc[0]), abs=1e-5)


def test_image_free_model_never_ships_plane(checkpoint):
    """Image-free families compile ONLY the packed-only program (no extra
    compile, no zero-plane transfer ever) and reject volume requests."""
    scorer = RiskScorer("rnaseq_only", checkpoint)
    assert scorer._no_image_ready
    with pytest.raises(ValueError, match="no image modality"):
        scorer.score(volume=np.zeros((8, 8, 8), np.float32))


def test_aot_cache_scorer_hit_matches_compile(checkpoint, tmp_path):
    """Second scorer process loads the persisted executable (no recompile)
    and scores identically; the checkpoint is a runtime argument, so a
    DIFFERENT fold reuses the same cached program."""
    cache = tmp_path / "aot"
    rng = np.random.default_rng(3)
    rna = rng.normal(size=80)

    s1 = RiskScorer("rnaseq_only", checkpoint, rna_dim=80,
                    aot_cache_dir=cache)
    assert s1.aot_info["score_no_image"]["source"] == "compile"
    want = s1.score(rnaseq=rna, age=55)["risk_score"]

    s2 = RiskScorer("rnaseq_only", checkpoint, rna_dim=80,
                    aot_cache_dir=cache)
    assert s2.aot_info["score_no_image"]["source"] == "cache"
    assert s2.score(rnaseq=rna, age=55)["risk_score"] == want

    # plain (cache-off) scorer agrees: the cache cannot change results
    s3 = RiskScorer("rnaseq_only", checkpoint, rna_dim=80)
    assert s3.score(rnaseq=rna, age=55)["risk_score"] == want

    # a different fold checkpoint HITS the same entry (params are args)
    other = checkpoint.parent / "fold_2_best.msgpack"
    s4 = RiskScorer("rnaseq_only", other, rna_dim=80, aot_cache_dir=cache)
    assert s4.aot_info["score_no_image"]["source"] == "cache"
    fold2_score = s4.score(rnaseq=rna, age=55)["risk_score"]
    assert np.isfinite(fold2_score)

    # warmup is idempotent with the cache on: a second (defensive) call
    # must not feed the already-swapped Compiled back into lower()
    s4.warmup_no_image()
    assert s4.score(rnaseq=rna, age=55)["risk_score"] == fold2_score
