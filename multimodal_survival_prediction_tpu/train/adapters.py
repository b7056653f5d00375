"""Per-model-family adapters: batch dict -> model inputs, outputs -> (hazard,
auxiliary loss). Keeps the engine model-agnostic while reproducing each
reference training script's loss composition (SURVEY §2.5, §2.6)."""

from __future__ import annotations

from ..config import ModelRunConfig
from ..models import (
    FlexibleMultimodalModel,
    ImageOnlyModel,
    MMsurvNet,
    MultiModalSurvivalNet,
    PartialModalityNet,
    RNASeqSurvivalModel,
    SimMLMSurvivalNet,
    SimpleFusionModel,
)
from ..ops.cox import cox_partial_likelihood, gate_entropy_loss


def make_model_and_adapters(cfg: ModelRunConfig, rna_dim: int | None = None,
                            backbone: str = "densenet121",
                            dtype=None, remat: bool = False):
    """Returns (model, batch_to_inputs, hazard_and_aux)."""
    name = cfg.name
    img_kw = dict(backbone=backbone, dtype=dtype, remat=remat)

    if name == "rnaseq_only":
        model = RNASeqSurvivalModel(dtype=dtype)
        return model, (lambda b: (b["rnaseq"],)), None

    if name == "image_only":
        model = ImageOnlyModel(dtype=dtype)
        return model, (lambda b: (b["image"],)), None

    if name == "simple_fusion":
        model = SimpleFusionModel(**img_kw)
        return model, (lambda b: (b["image"], b["rnaseq"])), None

    if name == "flexible_multimodal":
        model = FlexibleMultimodalModel(**img_kw)
        # mask: [has_image, has_rnaseq] (reference flexible_multimodal.py:142)
        return model, (lambda b: (b["image"], b["rnaseq"],
                                  b["mask"][:, :2])), None

    if name == "final":
        model = MultiModalSurvivalNet(**img_kw)
        return model, (lambda b: (b["image"], b["rnaseq"],
                                  b["clinical"])), None

    if name == "partial_modality":
        model = PartialModalityNet(**img_kw)
        w = cfg.gate_entropy_weight

        def hazard_and_aux(out, batch):
            hazard, gates = out
            # gate entropy over ALL (valid) samples incl. unlabeled
            # (reference partial_modality_training.py:401-422)
            aux = w * gate_entropy_loss(gates, valid=batch["valid"])
            return hazard, aux

        return model, (lambda b: (b["image"], b["rnaseq"], b["clinical"],
                                  b["mask"])), hazard_and_aux

    if name == "simmim":
        model = SimMLMSurvivalNet(**img_kw)
        lam = cfg.mofe_lambda

        def hazard_and_aux(out, batch):
            ensemble, experts, gates = out
            # MoFe: each modality expert's own Cox loss on samples where that
            # modality is present AND labeled; training script is absent from
            # the reference, reconstructed from the model's per-expert cox
            # heads (reference generate_km_curves.py:208) + mofe_lambda in
            # results/simmim/cv_results.json.
            aux = 0.0
            for m in range(3):
                aux = aux + cox_partial_likelihood(
                    experts[:, m], batch["time"], batch["event"],
                    valid=batch["svalid"] * batch["mask"][:, m],
                )
            return ensemble, lam * aux / 3.0

        return model, (lambda b: (b["image"], b["rnaseq"], b["clinical"],
                                  b["mask"])), hazard_and_aux

    if name == "mmsurv":
        model = MMsurvNet(**img_kw)
        return model, (lambda b: (b["image"], b["rnaseq"], b["clinical"],
                                  b["mask"])), None

    raise ValueError(f"unknown model {name!r}")


def simmlm_stage1_adapter():
    """SimMLM stage-1 (expert pretraining) loss: per-expert Cox losses only,
    ensemble head disabled (main_scale=0). Reconstructed from the two-stage
    schedule in results/simmim/cv_results.json hyperparameters
    (stage1_epochs=30 before the 50 stage-2 epochs)."""

    def hazard_and_aux(out, batch):
        ensemble, experts, gates = out
        aux = 0.0
        for m in range(3):
            aux = aux + cox_partial_likelihood(
                experts[:, m], batch["time"], batch["event"],
                valid=batch["svalid"] * batch["mask"][:, m],
            )
        return ensemble, aux / 3.0, 0.0

    return hazard_and_aux
