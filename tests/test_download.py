"""Offline tests for the download layer (VERDICT r3 weak #5 / task #5).

The four scripts under scripts/download/ are network-gated in production;
here their logic runs against fabricated data trees and canned GDC/TCIA JSON
via a fake ``requests`` module injected into sys.modules (every network call
in those scripts does a function-local ``import requests``). Covered:

* validate_data.py — the reference's coarse directory rule
  (reference scripts/download/validate_data.py:57-78, incl. the coarse-RNA
  quirk where has_rnaseq is true for EVERY patient once the dir exists) and
  the repo's --strict per-patient extension, plus the three artifacts.
* sample_patients.py — GDC cases filter payload, GDC∩TCIA intersection,
  seed-42 deterministic sampling (reference sample_patients.py:25-94).
* download_tcga.py — 50-patient query batching + filter payloads (reference
  download_tcga.py:38-75), manifest TSV contents, clinical flattening +
  cohort filter, and the gdc-client-absent degradation.
* download_tcia.py — series fetch, cohort filter, size estimate, --yes
  bypass, per-series failure accounting in download_summary.json
  (reference download_tcia.py series loop).
"""

import io
import json
import sys
import zipfile
from pathlib import Path

import pandas as pd
import pytest

SCRIPTS = Path(__file__).resolve().parents[1] / "scripts" / "download"


@pytest.fixture()
def dl(monkeypatch):
    """Import the download scripts as modules (they live outside the
    package and import each other as top-level ``common``)."""
    monkeypatch.syspath_prepend(str(SCRIPTS))
    # force fresh imports so the fake requests of one test never leaks
    for name in ("common", "validate_data", "sample_patients",
                 "download_tcga", "download_tcia"):
        sys.modules.pop(name, None)
    import download_tcga
    import download_tcia
    import sample_patients
    import validate_data

    yield dict(validate=validate_data, sample=sample_patients,
               tcga=download_tcga, tcia=download_tcia)
    for name in ("common", "validate_data", "sample_patients",
                 "download_tcga", "download_tcia"):
        sys.modules.pop(name, None)


class _FakeResponse:
    def __init__(self, payload=None, content=b"", status=200):
        self._payload = payload
        self.content = content
        self.status_code = status

    def raise_for_status(self):
        if self.status_code >= 400:
            raise RuntimeError(f"HTTP {self.status_code}")

    def json(self):
        return self._payload


class _FakeRequests:
    """Stands in for the requests module; records every call."""

    def __init__(self, post_handler=None, get_handler=None):
        self.post_calls = []
        self.get_calls = []
        self._post = post_handler
        self._get = get_handler

    def post(self, url, json=None, timeout=None, **kw):
        self.post_calls.append({"url": url, "json": json})
        return self._post(url, json)

    def get(self, url, params=None, timeout=None, **kw):
        self.get_calls.append({"url": url, "params": params})
        return self._get(url, params)


def _install_fake_requests(monkeypatch, fake):
    monkeypatch.setitem(sys.modules, "requests", fake)


# ---------------------------------------------------------------- validate


def _make_tree(root: Path, patients, imaging_for=(), rna_files_for=(),
               clinical_for=()):
    data = root / "data"
    (data / "genomic" / "rnaseq").mkdir(parents=True)
    (data / "genomic" / "mutation").mkdir(parents=True)
    (data / "genomic" / "cnv").mkdir(parents=True)
    (data / "clinical").mkdir(parents=True)
    pd.DataFrame({"patient_id": patients}).to_csv(
        data / "sampled_patients.csv", index=False)
    for pid in imaging_for:
        series = data / "imaging" / "dicom" / pid / "1.2.3.4"
        series.mkdir(parents=True)
        (series / "slice0.dcm").write_bytes(b"\x00" * 64)
    for pid in rna_files_for:
        (data / "genomic" / "rnaseq" / f"{pid}.rna_seq.tsv").write_text("g\t1\n")
    pd.DataFrame({"submitter_id": list(clinical_for)}).to_csv(
        data / "clinical" / "clinical.csv", index=False)
    return data


def test_validate_coarse_rule(dl, tmp_path, monkeypatch, capsys):
    """The reference rule is COARSE: has_rnaseq is True for every patient as
    soon as the rnaseq directory exists (reference validate_data.py:57-59) —
    complete = imaging AND (coarse) rna AND clinical."""
    patients = ["TCGA-AA-0001", "TCGA-AA-0002", "TCGA-AA-0003"]
    data = _make_tree(tmp_path, patients,
                      imaging_for=["TCGA-AA-0001", "TCGA-AA-0002"],
                      rna_files_for=["TCGA-AA-0001"],  # irrelevant to coarse
                      clinical_for=["TCGA-AA-0001", "TCGA-AA-0003"])
    monkeypatch.setattr(sys, "argv",
                        ["validate_data.py", "--data-root", str(tmp_path)])
    dl["validate"].main()

    df = pd.read_csv(data / "validation_results.csv")
    assert df.has_rnaseq.all()  # the coarse-RNA quirk
    assert list(df.has_imaging) == [True, True, False]
    assert list(df.has_clinical) == [True, False, True]
    assert list(df.complete) == [True, False, False]

    complete = pd.read_csv(data / "multimodal_patients.csv")
    assert list(complete.patient_id) == ["TCGA-AA-0001"]

    summary = json.loads((data / "data_summary.json").read_text())
    assert summary["total_patients"] == 3
    assert summary["with_imaging"] == 2
    assert summary["with_rnaseq"] == 3  # coarse
    assert summary["complete"] == 1
    assert summary["disk_usage_bytes"]["imaging"] == 128  # 2 × 64-byte slices


def test_validate_strict_rule(dl, tmp_path, monkeypatch):
    """--strict replaces the coarse rule with per-patient file presence."""
    patients = ["TCGA-AA-0001", "TCGA-AA-0002"]
    data = _make_tree(tmp_path, patients,
                      imaging_for=patients,
                      rna_files_for=["TCGA-AA-0001"],
                      clinical_for=patients)
    monkeypatch.setattr(sys, "argv",
                        ["validate_data.py", "--data-root", str(tmp_path),
                         "--strict"])
    dl["validate"].main()
    df = pd.read_csv(data / "validation_results.csv")
    assert list(df.has_rnaseq) == [True, False]
    assert list(df.complete) == [True, False]


def test_validate_missing_cohort_degrades(dl, tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv",
                        ["validate_data.py", "--data-root", str(tmp_path)])
    dl["validate"].main()  # no data/sampled_patients.csv
    assert "no cohort" in capsys.readouterr().out


# ------------------------------------------------------------------ sample


def test_sample_patients_intersection_and_seed(dl, tmp_path, monkeypatch):
    """GDC∩TCIA intersect, seed-42 random.sample, artifacts + summary
    (reference sample_patients.py:25-94). The GDC query must filter on
    project.project_id; TCIA on Collection."""
    gdc_ids = [f"TCGA-XX-{i:04d}" for i in range(40)]
    tcia_ids = [f"TCGA-XX-{i:04d}" for i in range(20, 60)]  # overlap = 20..39

    def post(url, body):
        assert url.endswith("/cases")
        assert body["filters"]["content"]["field"] == "project.project_id"
        assert body["filters"]["content"]["value"] == ["TCGA-OV"]
        return _FakeResponse(
            {"data": {"hits": [{"submitter_id": s} for s in gdc_ids]}})

    def get(url, params):
        assert url.endswith("/getPatient")
        assert params == {"Collection": "TCGA-OV"}
        return _FakeResponse([{"PatientId": s} for s in tcia_ids])

    fake = _FakeRequests(post, get)
    _install_fake_requests(monkeypatch, fake)
    monkeypatch.setattr(sys, "argv",
                        ["sample_patients.py", "--data-root", str(tmp_path),
                         "--sample-size", "10"])
    dl["sample"].main()

    data = tmp_path / "data"
    common = pd.read_csv(data / "all_common_patients.csv")
    assert list(common.patient_id) == sorted(
        f"TCGA-XX-{i:04d}" for i in range(20, 40))

    sample = pd.read_csv(data / "sampled_patients.csv")
    assert len(sample) == 10
    assert set(sample.patient_id) <= set(common.patient_id)

    # seed-42 determinism: re-running yields the identical sample
    first = list(sample.patient_id)
    monkeypatch.setattr(sys, "argv",
                        ["sample_patients.py", "--data-root", str(tmp_path),
                         "--sample-size", "10"])
    dl["sample"].main()
    assert list(pd.read_csv(data / "sampled_patients.csv").patient_id) == first

    summary = json.loads((data / "sampling_summary.json").read_text())
    assert summary == {"project": "TCGA-OV", "gdc_patients": 40,
                       "tcia_patients": 40, "common": 20, "sampled": 10,
                       "seed": 42}


def test_sample_patients_small_cohort_keeps_all(dl, tmp_path, monkeypatch):
    """When the intersection is smaller than --sample-size, every common
    patient is kept (no raise from random.sample)."""
    ids = ["TCGA-A", "TCGA-B"]
    fake = _FakeRequests(
        lambda u, b: _FakeResponse(
            {"data": {"hits": [{"submitter_id": s} for s in ids]}}),
        lambda u, p: _FakeResponse([{"PatientId": s} for s in ids]))
    _install_fake_requests(monkeypatch, fake)
    monkeypatch.setattr(sys, "argv",
                        ["sample_patients.py", "--data-root", str(tmp_path)])
    dl["sample"].main()
    out = pd.read_csv(tmp_path / "data" / "sampled_patients.csv")
    assert list(out.patient_id) == ids


# ------------------------------------------------------------------- tcga


def test_query_files_batches_of_50(dl, monkeypatch):
    """120 patients → 3 POSTs with 50/50/20-patient filter chunks; each
    payload carries the project + submitter_id + data_type clauses
    (reference download_tcga.py:38-75 URL-length workaround)."""
    patients = [f"P{i:03d}" for i in range(120)]
    responses = []

    def post(url, body):
        assert url.endswith("/files")
        clauses = {c["content"]["field"]: c["content"]["value"]
                   for c in body["filters"]["content"]}
        assert clauses["cases.project.project_id"] == ["TCGA-OV"]
        assert clauses["data_type"] == ["Gene Expression Quantification"]
        chunk = clauses["cases.submitter_id"]
        responses.append(len(chunk))
        return _FakeResponse({"data": {"hits": [
            {"file_id": f"f-{p}", "file_name": f"{p}.tsv",
             "md5sum": "0" * 32, "file_size": 1000} for p in chunk]}})

    fake = _FakeRequests(post_handler=post)
    _install_fake_requests(monkeypatch, fake)
    hits = dl["tcga"].query_files(
        "TCGA-OV", patients, "Gene Expression Quantification")
    assert responses == [50, 50, 20]
    assert len(hits) == 120
    assert hits[0]["file_id"] == "f-P000"


def test_write_manifest_tsv(dl, tmp_path):
    hits = [{"file_id": "uuid-1", "file_name": "a.tsv", "md5sum": "m1",
             "file_size": 11, "state": "released"},
            {"file_id": "uuid-2", "file_name": "b.tsv", "md5sum": "m2",
             "file_size": 22}]  # state defaults to released
    path = tmp_path / "manifest.tsv"
    dl["tcga"].write_manifest(hits, path)
    lines = path.read_text().splitlines()
    assert lines[0] == "id\tfilename\tmd5\tsize\tstate"
    assert lines[1] == "uuid-1\ta.tsv\tm1\t11\treleased"
    assert lines[2] == "uuid-2\tb.tsv\tm2\t22\treleased"


def test_download_clinical_flatten_and_filter(dl, tmp_path, monkeypatch):
    """cases?expand=diagnoses,demographic rows flatten to
    demographic.*/diagnoses.* columns; the cohort filter drops non-cohort
    hits (reference download_tcga.py clinical pull)."""
    hits = [
        {"submitter_id": "TCGA-A",
         "demographic": {"gender": "female", "vital_status": "Dead"},
         "diagnoses": [{"age_at_diagnosis": 21900,
                        "days_to_last_follow_up": 100}]},
        {"submitter_id": "TCGA-B", "demographic": {"gender": "female"},
         "diagnoses": []},
        {"submitter_id": "TCGA-Z"},  # not in cohort -> dropped
    ]

    def post(url, body):
        assert url.endswith("/cases")
        assert body["expand"] == "diagnoses,demographic,exposures"
        return _FakeResponse({"data": {"hits": hits}})

    _install_fake_requests(monkeypatch, _FakeRequests(post_handler=post))
    out = tmp_path / "clinical" / "clin.csv"
    n = dl["tcga"].download_clinical("TCGA-OV", ["TCGA-A", "TCGA-B"], out)
    assert n == 2
    df = pd.read_csv(out)
    assert set(df.submitter_id) == {"TCGA-A", "TCGA-B"}
    a = df[df.submitter_id == "TCGA-A"].iloc[0]
    assert a["demographic.gender"] == "female"
    assert a["diagnoses.age_at_diagnosis"] == 21900


def test_download_tcga_main_without_gdc_client(dl, tmp_path, monkeypatch,
                                               capsys):
    """End-to-end main(): cohort read, per-type manifests written, and the
    no-gdc-client path degrades to 'manifest written, download skipped'
    instead of shelling out."""
    data = tmp_path / "data"
    data.mkdir(parents=True)
    pd.DataFrame({"patient_id": ["TCGA-A", "TCGA-B"]}).to_csv(
        data / "sampled_patients.csv", index=False)

    def post(url, body):
        if url.endswith("/files"):
            return _FakeResponse({"data": {"hits": [
                {"file_id": "f1", "file_name": "x.tsv", "md5sum": "m",
                 "file_size": 5}]}})
        return _FakeResponse({"data": {"hits": [
            {"submitter_id": "TCGA-A", "demographic": {"gender": "female"}}]}})

    _install_fake_requests(monkeypatch, _FakeRequests(post_handler=post))
    monkeypatch.setattr(dl["tcga"], "find_gdc_client", lambda: None)
    monkeypatch.setattr(sys, "argv",
                        ["download_tcga.py", "--data-root", str(tmp_path),
                         "--types", "rnaseq,cnv"])
    dl["tcga"].main()

    out = capsys.readouterr().out
    assert "download skipped" in out
    for key in ("rnaseq", "cnv"):
        manifest = data / "genomic" / key / "manifest.tsv"
        assert manifest.exists()
        assert "f1\tx.tsv" in manifest.read_text()
    clin = pd.read_csv(
        data / "clinical" / "tcga_ov_multimodal_clinical.csv")
    assert list(clin.submitter_id) == ["TCGA-A"]


def test_download_tcga_requires_cohort(dl, tmp_path, monkeypatch, capsys):
    _install_fake_requests(monkeypatch, _FakeRequests())
    monkeypatch.setattr(sys, "argv",
                        ["download_tcga.py", "--data-root", str(tmp_path)])
    dl["tcga"].main()
    assert "run sample_patients.py first" in capsys.readouterr().out


# ------------------------------------------------------------------- tcia


def _zip_bytes(names):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for n in names:
            z.writestr(n, b"DICM" + b"\x00" * 16)
    return buf.getvalue()


def test_download_tcia_main(dl, tmp_path, monkeypatch):
    """Series fetched, filtered to cohort, size estimated, downloaded with
    per-series failure accounting; --yes bypasses the interactive
    confirmation."""
    data = tmp_path / "data"
    data.mkdir(parents=True)
    pd.DataFrame({"patient_id": ["TCGA-A", "TCGA-B"]}).to_csv(
        data / "sampled_patients.csv", index=False)

    series = [
        {"PatientID": "TCGA-A", "SeriesInstanceUID": "1.1",
         "TotalSizeInBytes": 4e9},
        {"PatientID": "TCGA-B", "SeriesInstanceUID": "2.2",
         "TotalSizeInBytes": 2e9},
        {"PatientID": "TCGA-ZZ", "SeriesInstanceUID": "9.9",  # off-cohort
         "TotalSizeInBytes": 1e9},
    ]

    def get(url, params):
        if url.endswith("/getSeries"):
            assert params == {"Collection": "TCGA-OV"}
            return _FakeResponse(series)
        assert url.endswith("/getImage")
        uid = params["SeriesInstanceUID"]
        if uid == "2.2":
            return _FakeResponse(status=500)  # raise_for_status fails
        return _FakeResponse(content=_zip_bytes(["000000.dcm", "000001.dcm"]))

    _install_fake_requests(monkeypatch, _FakeRequests(get_handler=get))
    monkeypatch.setattr("builtins.input",
                        lambda *a: pytest.fail("--yes must skip input()"))
    monkeypatch.setattr(sys, "argv",
                        ["download_tcia.py", "--data-root", str(tmp_path),
                         "--yes"])
    dl["tcia"].main()

    img = data / "imaging"
    meta = pd.read_csv(img / "series_metadata.csv")
    assert set(meta.PatientID) == {"TCGA-A", "TCGA-B"}  # cohort filter

    # successful series extracted as DICOM slices
    assert (img / "dicom" / "TCGA-A" / "1.1" / "000000.dcm").exists()
    summary = json.loads((img / "download_summary.json").read_text())
    assert summary["requested"] == 2
    assert summary["downloaded"] == 1
    assert len(summary["failed"]) == 1
    assert summary["failed"][0]["series"] == "2.2"

    per_patient = pd.read_csv(img / "patient_series_summary.csv")
    assert set(per_patient.PatientID) == {"TCGA-A", "TCGA-B"}


def test_download_tcia_confirmation_abort(dl, tmp_path, monkeypatch, capsys):
    """Without --yes a non-'y' answer aborts before any download."""
    data = tmp_path / "data"
    data.mkdir(parents=True)
    pd.DataFrame({"patient_id": ["TCGA-A"]}).to_csv(
        data / "sampled_patients.csv", index=False)

    def get(url, params):
        if url.endswith("/getSeries"):
            return _FakeResponse([{"PatientID": "TCGA-A",
                                   "SeriesInstanceUID": "1.1",
                                   "TotalSizeInBytes": 1e9}])
        pytest.fail("must not download after abort")

    _install_fake_requests(monkeypatch, _FakeRequests(get_handler=get))
    monkeypatch.setattr("builtins.input", lambda *a: "n")
    monkeypatch.setattr(sys, "argv",
                        ["download_tcia.py", "--data-root", str(tmp_path)])
    dl["tcia"].main()
    assert "aborted" in capsys.readouterr().out
    assert not (data / "imaging" / "dicom").exists()
