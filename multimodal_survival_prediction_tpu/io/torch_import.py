"""Import the reference's trained torch checkpoints into this framework.

The reference saves plain ``model.state_dict()`` files per fold (reference
partial_modality_training.py:556, train_rnaseq_only.py:286). A user
migrating from the reference can convert those ``.pth`` files into this
framework's checkpoint format and score/serve/analyze them with every
existing tool (predict_risk, RiskScorer, generate_km_curves) — no retraining.

Supported model families (verified against live torch oracles in
tests/test_torch_import.py):

  * ``rnaseq_only`` — reference ``RNASeqSurvivalModel`` (MLP
    5005→1024→512→256→1, train_rnaseq_only.py:126-151; keys ``mlp.{i}.*``).
  * ``partial_modality`` (flagship) — reference ``PartialModalityNet``
    (partial_modality_training.py:165-232) with either CT backbone:
    the MONAI ``DenseNet121(spatial_dims=3)`` encoder
    (keys ``ct_encoder.features.denseblock*.denselayer*...``) or the
    MONAI-less simple-CNN fallback (keys ``ct_encoder.{0,3,6}.*``).
  * ``simple_fusion`` — reference ``SimpleFusionModel``
    (simple_fusion.py:160-236), either backbone.
  * ``flexible_multimodal`` — reference ``FlexibleMultimodalModel``
    (flexible_multimodal.py:157-256) incl. the learnable
    missing-modality bias vectors, either backbone.
  * ``final`` — reference ``MultiModalSurvivalNet``
    (final_multimodal.py:59-150), either backbone.

  * ``image_only`` — the small 3D CNN the reference's KM script loads
    (generate_km_curves.py:28-54; its training script is absent upstream,
    but the checkpoint layout is defined there).
  * ``simmim`` — SimMLM mixture-of-modality-experts
    (generate_km_curves.py:160-281), either image-expert backbone.

  Not importable: ``mmsurv`` (no reference implementation exists at all).

Weight-layout conventions translated:
  * torch ``nn.Linear`` weight is (out, in); flax ``Dense`` kernel is
    (in, out) → transpose.
  * torch ``nn.Conv3d`` weight is (out, in, D, H, W); flax ``Conv`` kernel
    is (D, H, W, in, out) → transpose (2, 3, 4, 1, 0).
  * torch BatchNorm ``weight``/``bias`` → flax ``scale``/``bias`` (params);
    ``running_mean``/``running_var`` → ``mean``/``var`` (batch_stats).
    ``num_batches_tracked`` is torch bookkeeping and is dropped.

MONAI vs torchvision DenseNet naming: MONAI nests each dense layer's
modules under ``.layers.`` (``denselayer1.layers.norm1``); torchvision does
not. ``_normalize_key`` strips the ``.layers.`` segment so both load.
"""

from __future__ import annotations

import numpy as np

# DenseNet121 structure constants (models/densenet3d.py defaults; MONAI
# DenseNet121(spatial_dims=3, in_channels=1, out_channels=128)).
_DN_BLOCKS = (6, 12, 24, 16)


def load_torch_state_dict(path) -> dict:
    """Read a ``.pth`` state_dict into a {key: np.ndarray} dict.

    Accepts both a bare state_dict and the common ``{"state_dict": ...}``
    wrapping; strips a ``module.`` DataParallel prefix if present. torch is
    imported lazily — the framework itself contains no torch; this importer
    is the explicit migration boundary.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if (isinstance(obj, dict) and "state_dict" in obj
            and not torch.is_tensor(obj["state_dict"])):
        obj = obj["state_dict"]
    return {
        (k[len("module."):] if k.startswith("module.") else k):
            v.detach().cpu().numpy()
        for k, v in obj.items()
    }


def _normalize_key(k: str) -> str:
    return k.replace(".layers.", ".")


def _index(sd: dict) -> dict:
    return {_normalize_key(k): np.asarray(v) for k, v in sd.items()}


class _Missing(KeyError):
    pass


def _take(sd: dict, key: str) -> np.ndarray:
    try:
        return sd.pop(key)
    except KeyError:
        raise _Missing(
            f"torch checkpoint is missing {key!r} — wrong --model family "
            "or backbone for this state_dict?") from None


def _linear(sd, prefix):
    """torch nn.Linear -> flax Dense param dict."""
    out = {"kernel": np.ascontiguousarray(_take(sd, f"{prefix}.weight").T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _take(sd, f"{prefix}.bias")
    return out


def _conv3d(sd, prefix):
    """torch nn.Conv3d -> flax Conv param dict (channels-last kernel)."""
    w = _take(sd, f"{prefix}.weight")
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _take(sd, f"{prefix}.bias")
    return out


def _bn(sd, prefix):
    """torch BatchNorm -> (flax params, flax batch_stats)."""
    params = {"scale": _take(sd, f"{prefix}.weight"),
              "bias": _take(sd, f"{prefix}.bias")}
    stats = {"mean": _take(sd, f"{prefix}.running_mean"),
             "var": _take(sd, f"{prefix}.running_var")}
    sd.pop(f"{prefix}.num_batches_tracked", None)
    return params, stats


def _densenet121(sd, prefix="ct_encoder"):
    """MONAI DenseNet121(spatial_dims=3) state_dict -> flax DenseNet121_3D
    (models/densenet3d.py) params/batch_stats subtrees."""
    p, s = {}, {}
    p["conv0"] = {"conv": _conv3d(sd, f"{prefix}.features.conv0")}
    p["norm0"], s["norm0"] = ({"bn": x} for x in
                              _bn(sd, f"{prefix}.features.norm0"))
    for bi, n_layers in enumerate(_DN_BLOCKS):
        for li in range(n_layers):
            tp = f"{prefix}.features.denseblock{bi + 1}.denselayer{li + 1}"
            name = f"block{bi}_layer{li}"
            n1p, n1s = _bn(sd, f"{tp}.norm1")
            n2p, n2s = _bn(sd, f"{tp}.norm2")
            p[name] = {"norm1": {"bn": n1p},
                       "conv1": {"conv": _conv3d(sd, f"{tp}.conv1")},
                       "norm2": {"bn": n2p},
                       "conv2": {"conv": _conv3d(sd, f"{tp}.conv2")}}
            s[name] = {"norm1": {"bn": n1s}, "norm2": {"bn": n2s}}
        if bi != len(_DN_BLOCKS) - 1:
            tp = f"{prefix}.features.transition{bi + 1}"
            np_, ns_ = _bn(sd, f"{tp}.norm")
            p[f"transition{bi}"] = {"norm": {"bn": np_},
                                    "conv": {"conv": _conv3d(sd, f"{tp}.conv")}}
            s[f"transition{bi}"] = {"norm": {"bn": ns_}}
    p["norm5"], s["norm5"] = ({"bn": x} for x in
                              _bn(sd, f"{prefix}.features.norm5"))
    # MONAI head: class_layers = relu/pool/flatten/out; flax: Dense "head"
    p["head"] = _linear(sd, f"{prefix}.class_layers.out")
    return p, s


def _simple_cnn(sd, prefix="ct_encoder"):
    """Reference MONAI-less fallback encoder (Sequential Conv/BN/ReLU x3 +
    pool, partial_modality_training.py:179-191) -> flax SimpleCNN3D."""
    p, s = {}, {}
    for i, seq in enumerate((0, 3, 6)):
        p[f"conv{i}"] = {"conv": _conv3d(sd, f"{prefix}.{seq}")}
        bnp, bns = _bn(sd, f"{prefix}.{seq + 1}")
        p[f"bn{i}"] = {"bn": bnp}
        s[f"bn{i}"] = {"bn": bns}
    return p, s


def _rna_deep(sd, prefix="rna_encoder"):
    """Reference deep RNA encoder (Sequential {0,1,4,5,8}: 5005→1024→512→256,
    simple_fusion.py:167-179) -> flax RNAEncoderDeep."""
    p, s = {}, {}
    for i, seq in enumerate((0, 4)):
        bnp, bns = _bn(sd, f"{prefix}.{seq + 1}")
        p[f"block{i}"] = {"linear": {"dense": _linear(sd, f"{prefix}.{seq}")},
                          "norm": {"bn": bnp}}
        s[f"block{i}"] = {"norm": {"bn": bns}}
    p["proj"] = {"dense": _linear(sd, f"{prefix}.8")}
    return p, s


def _rna_compact(sd, prefix="rna_encoder"):
    """Reference compact RNA encoder (Sequential {0,1,4}: 5005→512→128,
    final_multimodal.py:94-101) -> flax RNAEncoderCompact."""
    bnp, bns = _bn(sd, f"{prefix}.1")
    p = {"block0": {"linear": {"dense": _linear(sd, f"{prefix}.0")},
                    "norm": {"bn": bnp}},
         "proj": {"dense": _linear(sd, f"{prefix}.4")}}
    return p, {"block0": {"norm": {"bn": bns}}}


def _fusion_head(sd, prefix="fusion"):
    """Reference 3-layer fusion head (Sequential {0,1,4,7}: cat→256→128→1,
    simple_fusion.py:206-215) -> flax _FusionHead."""
    bnp, bns = _bn(sd, f"{prefix}.1")
    p = {"block0": {"linear": {"dense": _linear(sd, f"{prefix}.0")},
                    "norm": {"bn": bnp}},
         "linear1": {"dense": _linear(sd, f"{prefix}.4")},
         "out": {"dense": _linear(sd, f"{prefix}.7")}}
    return p, {"block0": {"norm": {"bn": bns}}}


def _image_encoder(sd, prefix, backbone):
    """Either CT backbone -> flax ImageEncoder subtree ('densenet' / 'cnn')."""
    if backbone == "densenet121":
        dn_p, dn_s = _densenet121(sd, prefix)
        return {"densenet": dn_p}, {"densenet": dn_s}
    if backbone == "simple_cnn":
        c_p, c_s = _simple_cnn(sd, prefix)
        return {"cnn": c_p}, {"cnn": c_s}
    raise ValueError(f"unknown backbone {backbone!r}")


def import_rnaseq_state_dict(state_dict: dict) -> dict:
    """Reference RNASeqSurvivalModel state_dict -> flax variables for
    models/rnaseq.py:RNASeqSurvivalModel (hidden (1024, 512, 256))."""
    sd = _index(state_dict)
    params, stats = {}, {}
    for i in range(3):
        bnp, bns = _bn(sd, f"mlp.{4 * i + 1}")
        params[f"block{i}"] = {
            "linear": {"dense": _linear(sd, f"mlp.{4 * i}")},
            "norm": {"bn": bnp}}
        stats[f"block{i}"] = {"norm": {"bn": bns}}
    params["head"] = {"dense": _linear(sd, "mlp.12")}
    _assert_consumed(sd)
    return {"params": params, "batch_stats": stats}


def import_partial_modality_state_dict(state_dict: dict,
                                       backbone: str = "densenet121") -> dict:
    """Reference PartialModalityNet state_dict -> flax variables for
    models/gated.py:PartialModalityNet(backbone=...)."""
    sd = _index(state_dict)
    params, stats = {}, {}

    params["ct_encoder"], stats["ct_encoder"] = _image_encoder(
        sd, "ct_encoder", backbone)

    params["rna_encoder"], stats["rna_encoder"] = _rna_compact(sd)
    params["clinical_encoder"] = {
        "proj": {"dense": _linear(sd, "clinical_encoder.0")}}
    params["gate0"] = {"dense": _linear(sd, "gate.0")}
    params["gate1"] = {"dense": _linear(sd, "gate.2")}

    fbn_p, fbn_s = _bn(sd, "fusion.1")
    params["fusion_block"] = {
        "linear": {"dense": _linear(sd, "fusion.0")},
        "norm": {"bn": fbn_p}}
    stats["fusion_block"] = {"norm": {"bn": fbn_s}}
    params["fusion_proj"] = {"dense": _linear(sd, "fusion.4")}
    params["cox_head"] = {"dense": _linear(sd, "cox_head")}
    _assert_consumed(sd)
    return {"params": params, "batch_stats": stats}


def import_simple_fusion_state_dict(state_dict: dict,
                                    backbone: str = "densenet121") -> dict:
    """Reference SimpleFusionModel (simple_fusion.py:160-236) -> flax
    variables for models/fusion.py:SimpleFusionModel."""
    sd = _index(state_dict)
    params, stats = {}, {}
    params["rna_encoder"], stats["rna_encoder"] = _rna_deep(sd)
    params["image_encoder"], stats["image_encoder"] = _image_encoder(
        sd, "image_encoder", backbone)
    params["fusion"], stats["fusion"] = _fusion_head(sd)
    _assert_consumed(sd)
    return {"params": params, "batch_stats": stats}


def import_flexible_multimodal_state_dict(state_dict: dict,
                                          backbone: str = "densenet121"
                                          ) -> dict:
    """Reference FlexibleMultimodalModel (flexible_multimodal.py:157-256,
    learnable missing-modality bias vectors) -> flax variables for
    models/fusion.py:FlexibleMultimodalModel."""
    sd = _index(state_dict)
    params, stats = {}, {}
    params["image_encoder"], stats["image_encoder"] = _image_encoder(
        sd, "image_encoder", backbone)
    params["rna_encoder"], stats["rna_encoder"] = _rna_deep(sd)
    params["missing_image_bias"] = _take(sd, "missing_image_bias")
    params["missing_rna_bias"] = _take(sd, "missing_rna_bias")
    params["fusion"], stats["fusion"] = _fusion_head(sd)
    _assert_consumed(sd)
    return {"params": params, "batch_stats": stats}


def import_image_only_state_dict(state_dict: dict) -> dict:
    """Reference ImageOnlyModel (generate_km_curves.py:28-54: Conv 16/32/64
    + fc(64→32) + risk head) -> flax variables for
    models/image_only.py:ImageOnlyModel."""
    sd = _index(state_dict)
    enc_p, enc_s = _simple_cnn(sd, "encoder")
    params = {"encoder": enc_p,
              "fc": {"dense": _linear(sd, "fc.0")},
              "risk_head": {"dense": _linear(sd, "risk_head")}}
    _assert_consumed(sd)
    return {"params": params, "batch_stats": {"encoder": enc_s}}


def import_simmlm_state_dict(state_dict: dict,
                             backbone: str = "densenet121") -> dict:
    """Reference SimMLM_SurvivalNet (generate_km_curves.py:160-281: three
    ModalityExperts with per-expert cox heads, masked-softmax gating,
    ensemble head) -> flax variables for models/moe.py:SimMLMSurvivalNet."""
    sd = _index(state_dict)
    params, stats = {}, {}
    params["expert_image"], stats["expert_image"] = _image_encoder(
        sd, "expert_image.encoder", backbone)
    params["cox_image"] = {"dense": _linear(sd, "expert_image.cox_head")}

    params["expert_rnaseq"], stats["expert_rnaseq"] = _rna_compact(
        sd, "expert_rnaseq.encoder")
    params["cox_rnaseq"] = {"dense": _linear(sd, "expert_rnaseq.cox_head")}

    params["expert_clinical"] = {
        "fc0": {"dense": _linear(sd, "expert_clinical.encoder.0")},
        "fc1": {"dense": _linear(sd, "expert_clinical.encoder.2")}}
    params["cox_clinical"] = {
        "dense": _linear(sd, "expert_clinical.cox_head")}

    params["gating"] = {"fc0": {"dense": _linear(sd, "gating.gate.0")},
                        "fc1": {"dense": _linear(sd, "gating.gate.3")},
                        "fc2": {"dense": _linear(sd, "gating.gate.5")}}
    params["ensemble_cox"] = {"dense": _linear(sd, "ensemble_cox")}
    _assert_consumed(sd)
    return {"params": params, "batch_stats": stats}


def import_final_state_dict(state_dict: dict,
                            backbone: str = "densenet121") -> dict:
    """Reference MultiModalSurvivalNet (final_multimodal.py:59-150) -> flax
    variables for models/fusion.py:MultiModalSurvivalNet."""
    sd = _index(state_dict)
    params, stats = {}, {}
    params["ct_encoder"], stats["ct_encoder"] = _image_encoder(
        sd, "ct_encoder", backbone)
    params["rna_encoder"], stats["rna_encoder"] = _rna_compact(sd)
    params["clinical_encoder"] = {
        "proj": {"dense": _linear(sd, "clinical_encoder.0")}}
    fbn_p, fbn_s = _bn(sd, "fusion.1")
    params["fusion_block"] = {
        "linear": {"dense": _linear(sd, "fusion.0")},
        "norm": {"bn": fbn_p}}
    stats["fusion_block"] = {"norm": {"bn": fbn_s}}
    params["fusion_proj"] = {"dense": _linear(sd, "fusion.4")}
    params["cox_head"] = {"dense": _linear(sd, "cox_head")}
    _assert_consumed(sd)
    return {"params": params, "batch_stats": stats}


def _assert_consumed(sd: dict) -> None:
    leftovers = [k for k in sd if not k.endswith("num_batches_tracked")]
    if leftovers:
        raise ValueError(
            "torch state_dict has unmapped keys (wrong model family, or an "
            f"architecture this importer does not cover): {leftovers[:8]}")


_IMPORTERS = {
    "rnaseq_only": import_rnaseq_state_dict,
    "partial_modality": import_partial_modality_state_dict,
    "simple_fusion": import_simple_fusion_state_dict,
    "flexible_multimodal": import_flexible_multimodal_state_dict,
    "final": import_final_state_dict,
    "image_only": import_image_only_state_dict,
    "simmim": import_simmlm_state_dict,
}
# families whose CT backbone varies with the reference's MONAI availability
# (image_only's encoder is a fixed small CNN — no backbone choice there)
_IMAGE_FAMILIES = frozenset(
    ("partial_modality", "simple_fusion", "flexible_multimodal", "final",
     "simmim"))


def import_torch_checkpoint(model_name: str, path, backbone: str | None = None):
    """One-call import: read ``path`` (.pth) and return
    ``(flax variables, backbone_or_None)``.

    For image families, ``backbone`` defaults to auto-detection from the
    keys (``denseblock`` → MONAI DenseNet121, else the Sequential fallback).
    Raises KeyError/ValueError with actionable messages on mismatched
    families/backbones (every torch key must map; every mapped key must
    exist).
    """
    if model_name not in _IMPORTERS:
        raise ValueError(
            f"torch import not implemented for {model_name!r} "
            f"(supported: {sorted(_IMPORTERS)})")
    sd = load_torch_state_dict(path)
    if model_name in _IMAGE_FAMILIES:
        if backbone is None:
            backbone = ("densenet121"
                        if any("denseblock" in k for k in sd)
                        else "simple_cnn")
        return _IMPORTERS[model_name](sd, backbone=backbone), backbone
    return _IMPORTERS[model_name](sd), None


# --------------------------------------------------------------------------
# Export: flax variables -> reference torch state_dict (inverse direction).
# Each _exp_* mirrors its import helper; the roundtrip tests
# (tests/test_torch_import.py) pin export∘import == identity for every
# family, so the two maps cannot drift apart silently.
# --------------------------------------------------------------------------


def _exp_linear(out, prefix, tree):
    out[f"{prefix}.weight"] = np.ascontiguousarray(
        np.asarray(tree["kernel"]).T)
    if "bias" in tree:
        out[f"{prefix}.bias"] = np.asarray(tree["bias"])


def _exp_conv3d(out, prefix, tree):
    out[f"{prefix}.weight"] = np.ascontiguousarray(
        np.transpose(np.asarray(tree["kernel"]), (4, 3, 0, 1, 2)))
    if "bias" in tree:
        out[f"{prefix}.bias"] = np.asarray(tree["bias"])


def _exp_bn(out, prefix, p, s):
    out[f"{prefix}.weight"] = np.asarray(p["scale"])
    out[f"{prefix}.bias"] = np.asarray(p["bias"])
    out[f"{prefix}.running_mean"] = np.asarray(s["mean"])
    out[f"{prefix}.running_var"] = np.asarray(s["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _exp_densenet121(out, prefix, p, s):
    _exp_conv3d(out, f"{prefix}.features.conv0", p["conv0"]["conv"])
    _exp_bn(out, f"{prefix}.features.norm0", p["norm0"]["bn"],
            s["norm0"]["bn"])
    for bi, n_layers in enumerate(_DN_BLOCKS):
        for li in range(n_layers):
            tp = f"{prefix}.features.denseblock{bi + 1}.denselayer{li + 1}.layers"
            name = f"block{bi}_layer{li}"
            _exp_bn(out, f"{tp}.norm1", p[name]["norm1"]["bn"],
                    s[name]["norm1"]["bn"])
            _exp_conv3d(out, f"{tp}.conv1", p[name]["conv1"]["conv"])
            _exp_bn(out, f"{tp}.norm2", p[name]["norm2"]["bn"],
                    s[name]["norm2"]["bn"])
            _exp_conv3d(out, f"{tp}.conv2", p[name]["conv2"]["conv"])
        if bi != len(_DN_BLOCKS) - 1:
            tp = f"{prefix}.features.transition{bi + 1}"
            name = f"transition{bi}"
            _exp_bn(out, f"{tp}.norm", p[name]["norm"]["bn"],
                    s[name]["norm"]["bn"])
            _exp_conv3d(out, f"{tp}.conv", p[name]["conv"]["conv"])
    _exp_bn(out, f"{prefix}.features.norm5", p["norm5"]["bn"],
            s["norm5"]["bn"])
    _exp_linear(out, f"{prefix}.class_layers.out", p["head"])


def _exp_simple_cnn(out, prefix, p, s):
    for i, seq in enumerate((0, 3, 6)):
        _exp_conv3d(out, f"{prefix}.{seq}", p[f"conv{i}"]["conv"])
        _exp_bn(out, f"{prefix}.{seq + 1}", p[f"bn{i}"]["bn"],
                s[f"bn{i}"]["bn"])


def _exp_image_encoder(out, prefix, p, s):
    if "densenet" in p:
        _exp_densenet121(out, prefix, p["densenet"], s["densenet"])
    else:
        _exp_simple_cnn(out, prefix, p["cnn"], s["cnn"])


def _exp_rna_deep(out, prefix, p, s):
    for i, seq in enumerate((0, 4)):
        _exp_linear(out, f"{prefix}.{seq}",
                    p[f"block{i}"]["linear"]["dense"])
        _exp_bn(out, f"{prefix}.{seq + 1}", p[f"block{i}"]["norm"]["bn"],
                s[f"block{i}"]["norm"]["bn"])
    _exp_linear(out, f"{prefix}.8", p["proj"]["dense"])


def _exp_rna_compact(out, prefix, p, s):
    _exp_linear(out, f"{prefix}.0", p["block0"]["linear"]["dense"])
    _exp_bn(out, f"{prefix}.1", p["block0"]["norm"]["bn"],
            s["block0"]["norm"]["bn"])
    _exp_linear(out, f"{prefix}.4", p["proj"]["dense"])


def _exp_fusion_head(out, prefix, p, s):
    _exp_linear(out, f"{prefix}.0", p["block0"]["linear"]["dense"])
    _exp_bn(out, f"{prefix}.1", p["block0"]["norm"]["bn"],
            s["block0"]["norm"]["bn"])
    _exp_linear(out, f"{prefix}.4", p["linear1"]["dense"])
    _exp_linear(out, f"{prefix}.7", p["out"]["dense"])


def export_torch_state_dict(model_name: str, variables: dict) -> dict:
    """flax variables -> reference-layout torch state_dict ({key: ndarray}).

    Inverse of ``import_torch_checkpoint`` — a model trained HERE can be
    handed back to reference/torch tooling (``torch.load`` +
    ``load_state_dict(strict=True)`` on the reference class). The CT
    backbone is inferred from the variables ('densenet' vs 'cnn' subtree);
    MONAI key layout is emitted for DenseNet (incl. the ``.layers.``
    nesting).
    """
    p = {k: v for k, v in variables["params"].items()}
    s = dict(variables.get("batch_stats", {}))
    out: dict = {}
    if model_name == "rnaseq_only":
        for i in range(3):
            _exp_linear(out, f"mlp.{4 * i}",
                        p[f"block{i}"]["linear"]["dense"])
            _exp_bn(out, f"mlp.{4 * i + 1}", p[f"block{i}"]["norm"]["bn"],
                    s[f"block{i}"]["norm"]["bn"])
        _exp_linear(out, "mlp.12", p["head"]["dense"])
    elif model_name == "image_only":
        _exp_simple_cnn(out, "encoder", p["encoder"], s["encoder"])
        _exp_linear(out, "fc.0", p["fc"]["dense"])
        _exp_linear(out, "risk_head", p["risk_head"]["dense"])
    elif model_name == "partial_modality":
        _exp_image_encoder(out, "ct_encoder", p["ct_encoder"],
                           s["ct_encoder"])
        _exp_rna_compact(out, "rna_encoder", p["rna_encoder"],
                         s["rna_encoder"])
        _exp_linear(out, "clinical_encoder.0",
                    p["clinical_encoder"]["proj"]["dense"])
        _exp_linear(out, "gate.0", p["gate0"]["dense"])
        _exp_linear(out, "gate.2", p["gate1"]["dense"])
        _exp_linear(out, "fusion.0", p["fusion_block"]["linear"]["dense"])
        _exp_bn(out, "fusion.1", p["fusion_block"]["norm"]["bn"],
                s["fusion_block"]["norm"]["bn"])
        _exp_linear(out, "fusion.4", p["fusion_proj"]["dense"])
        _exp_linear(out, "cox_head", p["cox_head"]["dense"])
    elif model_name == "simple_fusion":
        _exp_rna_deep(out, "rna_encoder", p["rna_encoder"], s["rna_encoder"])
        _exp_image_encoder(out, "image_encoder", p["image_encoder"],
                           s["image_encoder"])
        _exp_fusion_head(out, "fusion", p["fusion"], s["fusion"])
    elif model_name == "flexible_multimodal":
        _exp_image_encoder(out, "image_encoder", p["image_encoder"],
                           s["image_encoder"])
        _exp_rna_deep(out, "rna_encoder", p["rna_encoder"], s["rna_encoder"])
        out["missing_image_bias"] = np.asarray(p["missing_image_bias"])
        out["missing_rna_bias"] = np.asarray(p["missing_rna_bias"])
        _exp_fusion_head(out, "fusion", p["fusion"], s["fusion"])
    elif model_name == "final":
        _exp_image_encoder(out, "ct_encoder", p["ct_encoder"],
                           s["ct_encoder"])
        _exp_rna_compact(out, "rna_encoder", p["rna_encoder"],
                         s["rna_encoder"])
        _exp_linear(out, "clinical_encoder.0",
                    p["clinical_encoder"]["proj"]["dense"])
        _exp_linear(out, "fusion.0", p["fusion_block"]["linear"]["dense"])
        _exp_bn(out, "fusion.1", p["fusion_block"]["norm"]["bn"],
                s["fusion_block"]["norm"]["bn"])
        _exp_linear(out, "fusion.4", p["fusion_proj"]["dense"])
        _exp_linear(out, "cox_head", p["cox_head"]["dense"])
    elif model_name == "simmim":
        _exp_image_encoder(out, "expert_image.encoder", p["expert_image"],
                           s["expert_image"])
        _exp_linear(out, "expert_image.cox_head", p["cox_image"]["dense"])
        _exp_rna_compact(out, "expert_rnaseq.encoder", p["expert_rnaseq"],
                         s["expert_rnaseq"])
        _exp_linear(out, "expert_rnaseq.cox_head", p["cox_rnaseq"]["dense"])
        _exp_linear(out, "expert_clinical.encoder.0",
                    p["expert_clinical"]["fc0"]["dense"])
        _exp_linear(out, "expert_clinical.encoder.2",
                    p["expert_clinical"]["fc1"]["dense"])
        _exp_linear(out, "expert_clinical.cox_head",
                    p["cox_clinical"]["dense"])
        _exp_linear(out, "gating.gate.0", p["gating"]["fc0"]["dense"])
        _exp_linear(out, "gating.gate.3", p["gating"]["fc1"]["dense"])
        _exp_linear(out, "gating.gate.5", p["gating"]["fc2"]["dense"])
        _exp_linear(out, "ensemble_cox", p["ensemble_cox"]["dense"])
    else:
        raise ValueError(
            f"torch export not implemented for {model_name!r} "
            f"(supported: {sorted(_IMPORTERS)})")
    return out


def validate_against_model(variables: dict, model, example_inputs) -> None:
    """Structure/shape-check imported variables against a real model init.

    Catches silent mis-mappings (a transposed kernel that happens to fit
    would NOT be caught here — the functional tests cover that; this guards
    tree structure and every leaf shape)."""
    import jax

    ref = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           *example_inputs, train=False))
    ref_flat = {
        "/".join(str(k.key) for k in path): leaf.shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(dict(ref))[0]}
    got_flat = {
        "/".join(str(k.key) for k in path): np.asarray(leaf).shape
        for path, leaf in
        jax.tree_util.tree_flatten_with_path(variables)[0]}
    missing = sorted(set(ref_flat) - set(got_flat))
    extra = sorted(set(got_flat) - set(ref_flat))
    if missing or extra:
        raise ValueError(
            f"imported tree mismatch: missing={missing[:6]} extra={extra[:6]}")
    bad = [k for k in ref_flat if tuple(ref_flat[k]) != tuple(got_flat[k])]
    if bad:
        raise ValueError(
            "imported leaf shape mismatch: "
            + ", ".join(f"{k}: torch{got_flat[k]} vs model{ref_flat[k]}"
                        for k in bad[:6]))
