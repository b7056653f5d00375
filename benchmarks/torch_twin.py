"""Torch twin of the reference RNA-only CV run, for quality-parity evidence.

Re-creates the reference `train_rnaseq_only.py` training loop (SURVEY §2.6,
reference train_rnaseq_only.py:157-287) in PyTorch, faithful to its
semantics — MLP 5005->1024->512->256->1 with BatchNorm1d+ReLU+Dropout(0.3),
AdamW(lr=1e-4, wd=1e-3), CosineAnnealingLR(T_max=epochs), bs=16, sklearn
KFold(3, shuffle, seed 42), 50 epochs, no grad clip, no early stop, pooled
per-epoch validation C-index, best-epoch selection — so the JAX build can be
compared against a live torch oracle on the SAME synthetic cohort with
bit-identical fold splits (scripts/analysis/run_parity.py drives both and
writes PARITY_TWIN.md + parity_results.json).

Two deliberate choices, documented:
  * Cox loss uses the stable sorted-logcumsumexp form (reference
    final_multimodal.py:178-186) rather than train_rnaseq_only.py's naive
    `log(cumsum(exp))` fallback — identical math, and it is what the JAX
    build implements (ops/cox.py module docstring).
  * C-index is an independent numpy Harrell implementation (0.5 credit for
    prediction ties — torchsurv semantics, the reference's primary path),
    NOT the framework's ops/cindex.py, so a metric bug cannot hide itself.

Benchmark/parity harness only — the framework itself contains no torch.
"""

from __future__ import annotations

import numpy as np


def harrell_cindex_np(hazard, time, event) -> float:
    """Independent O(n^2) Harrell's C (ties in prediction get 0.5)."""
    hazard = np.asarray(hazard, np.float64)
    time = np.asarray(time, np.float64)
    event = np.asarray(event)
    num = den = 0.0
    n = len(time)
    for i in range(n):
        if not event[i]:
            continue
        for j in range(n):
            comparable = time[j] > time[i] or (
                time[j] == time[i] and not event[j] and i != j)
            if not comparable:
                continue
            den += 1.0
            if hazard[i] > hazard[j]:
                num += 1.0
            elif hazard[i] == hazard[j]:
                num += 0.5
    return num / den if den else 0.5


def build_torch_rnaseq_model(rna_dim: int):
    import torch.nn as nn

    # reference train_rnaseq_only.py:126-151
    return nn.Sequential(
        nn.Linear(rna_dim, 1024), nn.BatchNorm1d(1024), nn.ReLU(),
        nn.Dropout(0.3),
        nn.Linear(1024, 512), nn.BatchNorm1d(512), nn.ReLU(),
        nn.Dropout(0.3),
        nn.Linear(512, 256), nn.BatchNorm1d(256), nn.ReLU(),
        nn.Dropout(0.3),
        nn.Linear(256, 1),
    )


def cox_loss_torch(hazard, time, event):
    """Stable sorted-logcumsumexp Cox partial likelihood
    (reference final_multimodal.py:178-186)."""
    import torch

    order = torch.argsort(time, descending=True)
    h, e = hazard[order], event[order]
    return -torch.sum((h - torch.logcumsumexp(h, 0)) * e) / (e.sum() + 1e-8)


def run_torch_partial_modality_cv(
    arrays: dict,
    n_folds: int = 3,
    num_epochs: int = 30,
    batch_size: int = 8,
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-4,
    gate_entropy_weight: float = 0.01,
    patience: int = 15,
    grad_clip: float = 1.0,
    seed: int = 42,
    split_seed: int | None = None,
    init_state_dicts: list | None = None,
):
    """Torch twin of the reference FLAGSHIP trainer (gated partial-modality,
    reference partial_modality_training.py:364-560): folds over the
    survival-labeled rows only with ALL unlabeled patients appended to every
    train set (:502-515), per-batch Cox on the labeled subset (skipped when
    <2 labeled or 0 events), gate-entropy regularizer over every sample
    (:401-422), Adam(wd = L2-into-grad), grad-clip 1.0, torch's own
    ReduceLROnPlateau(mode='max', factor=0.5, patience=5) on val C-index,
    patience-15 early stop, pooled per-epoch validation C-index.

    `arrays`: the framework data layer's array dict (data/datasets.py) —
    image (N,D,H,W,1), rnaseq (N,G), clinical (N,1), mask (N,3), time,
    event, svalid — so torch and JAX consume IDENTICAL bytes.

    Uses the architecture-identical torch gated net from
    benchmarks/torch_reference.py (DenseNet121-3D CT encoder + compact RNA
    MLP + clinical MLP + gate + fusion). Image depth/height/width must each
    survive 5 halvings (>= 32): use image_shape=(32,32,32) cohorts.

    `init_state_dicts`: optional per-fold reference-layout state_dicts
    (e.g. io.torch_import.export_torch_state_dict of the JAX trainer's
    fold inits) — when given, fold k starts from init_state_dicts[k-1]
    loaded strict into the reference-NAMED net
    (torch_reference_named.build_reference_named_partial_modality), so the
    torch oracle and the JAX build train from IDENTICAL initial weights
    (init-matched parity, VERDICT r3 #1). RNG seeding is unchanged: batch
    shuffles and dropout still draw from `seed`.
    """
    import torch
    from sklearn.model_selection import KFold

    from .torch_reference import build_torch_gated_net
    from .torch_reference_named import build_reference_named_partial_modality

    split_seed = seed if split_seed is None else split_seed
    torch.manual_seed(seed)
    np.random.seed(seed)

    image = torch.asarray(
        np.moveaxis(np.asarray(arrays["image"], np.float32), -1, 1))
    rna = torch.asarray(np.asarray(arrays["rnaseq"], np.float32))
    clin = torch.asarray(np.asarray(arrays["clinical"], np.float32))
    mask = torch.asarray(np.asarray(arrays["mask"], np.float32))
    time_t = torch.asarray(np.asarray(arrays["time"], np.float32))
    event_t = torch.asarray(np.asarray(arrays["event"], np.float32))
    svalid = np.asarray(arrays["svalid"], np.float32)

    labeled = np.nonzero(svalid > 0)[0]
    unlabeled = np.nonzero(svalid <= 0)[0]
    time_np = np.asarray(arrays["time"], np.float64)
    event_np = np.asarray(arrays["event"])

    kfold = KFold(n_splits=n_folds, shuffle=True, random_state=split_seed)
    results = []
    for fold, (tr, va) in enumerate(kfold.split(labeled), start=1):
        train_rows = np.concatenate([labeled[tr], unlabeled])
        val_rows = labeled[va]
        if init_state_dicts is not None:
            model = build_reference_named_partial_modality(rna.shape[1])
            model.load_state_dict(
                {k: torch.asarray(np.asarray(v))
                 for k, v in init_state_dicts[fold - 1].items()},
                strict=True)
        else:
            model = build_torch_gated_net(rna.shape[1])
        opt = torch.optim.Adam(model.parameters(), lr=learning_rate,
                               weight_decay=weight_decay)
        sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="max", factor=0.5, patience=5)
        tr_idx = torch.asarray(train_rows)
        best_c, best_epoch, bad, history = -np.inf, 0, 0, []
        for epoch in range(1, num_epochs + 1):
            model.train()
            perm = tr_idx[torch.randperm(len(tr_idx))]
            ep_losses = []
            for s in range(0, len(perm), batch_size):
                b = perm[s:s + batch_size]
                if len(b) < 2:
                    continue  # BatchNorm needs >= 2 rows
                opt.zero_grad()
                h, g = model(image[b], rna[b], clin[b], mask[b])
                sv = torch.asarray(svalid[b.numpy()]) > 0
                loss = torch.zeros(())
                if int(sv.sum()) >= 2 and float(event_t[b][sv].sum()) > 0:
                    loss = cox_loss_torch(h[sv], time_t[b][sv],
                                          event_t[b][sv])
                ent = -(g * torch.log(g + 1e-8)).sum(1).mean()
                loss = loss + gate_entropy_weight * (-ent)
                loss.backward()
                torch.nn.utils.clip_grad_norm_(model.parameters(), grad_clip)
                opt.step()
                ep_losses.append(float(loss.detach()))

            model.eval()
            with torch.no_grad():
                hv = model(image[val_rows], rna[val_rows], clin[val_rows],
                           mask[val_rows])[0].numpy()
            val_c = harrell_cindex_np(hv, time_np[val_rows],
                                      event_np[val_rows])
            sched.step(val_c)
            history.append(dict(epoch=epoch,
                                train_loss=float(np.mean(ep_losses or [0])),
                                val_c_index=val_c))
            if val_c > best_c:
                best_c, best_epoch, bad = val_c, epoch, 0
            else:
                bad += 1
            if patience is not None and bad >= patience:
                break
        results.append(dict(fold=fold, best_c_index=float(best_c),
                            best_epoch=best_epoch,
                            train_size=len(train_rows),
                            val_size=len(val_rows), history=history))
    return results


def _cox_loss_masked_torch(hazard, time, event, valid):
    """ops/cox.py masked semantics in torch: Cox over the valid subset; a
    degenerate subset (<2 rows or 0 events) contributes exactly 0 — the same
    pinned behavior as the JAX masked loss (tests/test_numeric_pins.py)."""
    import torch

    sel = valid > 0
    if int(sel.sum()) < 2 or float(event[sel].sum()) == 0:
        return torch.zeros(())
    return cox_loss_torch(hazard[sel], time[sel], event[sel])


def run_torch_image_only_cv(
    arrays: dict,
    n_folds: int = 5,
    num_epochs: int = 30,
    batch_size: int = 8,
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-4,
    patience: int = 15,
    grad_clip: float = 1.0,
    seed: int = 42,
    split_seed: int | None = None,
):
    """Torch twin of the IMAGE-ONLY trainer reconstruction (the reference
    ships the ImageOnlyModel only inside generate_km_curves.py:28-54 with NO
    training script; the framework reconstructs the trainer from the
    results/image_only artifacts + the final_multimodal.py conventions:
    Adam(L2 wd=1e-4), plateau-on-val-C, clip 1.0, patience-15, bs=8 —
    config.py:IMAGE_ONLY). This twin implements the IDENTICAL reconstruction
    in torch so the two trainers' dynamics can be compared on the same
    arrays with bit-identical folds."""
    import torch
    from sklearn.model_selection import KFold

    from .torch_reference_named import build_reference_named_image_only

    split_seed = seed if split_seed is None else split_seed
    torch.manual_seed(seed)
    np.random.seed(seed)

    image = torch.asarray(
        np.moveaxis(np.asarray(arrays["image"], np.float32), -1, 1))
    time_t = torch.asarray(np.asarray(arrays["time"], np.float32))
    event_t = torch.asarray(np.asarray(arrays["event"], np.float32))
    svalid_t = torch.asarray(np.asarray(arrays["svalid"], np.float32))
    time_np = np.asarray(arrays["time"], np.float64)
    event_np = np.asarray(arrays["event"])

    kfold = KFold(n_splits=n_folds, shuffle=True, random_state=split_seed)
    results = []
    for fold, (tr, va) in enumerate(kfold.split(np.arange(len(time_np))),
                                    start=1):
        model = build_reference_named_image_only()
        opt = torch.optim.Adam(model.parameters(), lr=learning_rate,
                               weight_decay=weight_decay)
        sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="max", factor=0.5, patience=5)
        tr_idx = torch.asarray(tr)
        best_c, best_epoch, bad, history = -np.inf, 0, 0, []
        for epoch in range(1, num_epochs + 1):
            model.train()
            perm = tr_idx[torch.randperm(len(tr_idx))]
            ep_losses = []
            for s in range(0, len(perm), batch_size):
                b = perm[s:s + batch_size]
                if len(b) < 2:
                    continue  # BatchNorm needs >= 2 rows
                opt.zero_grad()
                h = model(image[b])
                loss = _cox_loss_masked_torch(h, time_t[b], event_t[b],
                                              svalid_t[b])
                if not loss.requires_grad:
                    continue  # degenerate batch: nothing to backprop
                loss.backward()
                torch.nn.utils.clip_grad_norm_(model.parameters(), grad_clip)
                opt.step()
                ep_losses.append(float(loss.detach()))

            model.eval()
            with torch.no_grad():
                hv = model(image[va]).numpy()
            val_c = harrell_cindex_np(hv, time_np[va], event_np[va])
            sched.step(val_c)
            history.append(dict(epoch=epoch,
                                train_loss=float(np.mean(ep_losses or [0])),
                                val_c_index=val_c))
            if val_c > best_c:
                best_c, best_epoch, bad = val_c, epoch, 0
            else:
                bad += 1
            if patience is not None and bad >= patience:
                break
        results.append(dict(fold=fold, best_c_index=float(best_c),
                            best_epoch=best_epoch, train_size=len(tr),
                            val_size=len(va), history=history))
    return results


def run_torch_simmlm_cv(
    arrays: dict,
    n_folds: int = 3,
    stage1_epochs: int = 30,
    num_epochs: int = 50,
    batch_size: int = 8,
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-4,
    mofe_lambda: float = 0.1,
    patience: int = 15,
    grad_clip: float = 1.0,
    seed: int = 42,
    split_seed: int | None = None,
    use_monai: bool = True,
):
    """Torch twin of the SimMLM TWO-STAGE MoFe reconstruction — the riskiest
    trainer reconstruction in the repo (the reference ships NO SimMLM
    training script; the schedule is reconstructed from
    results/simmim/cv_results.json hyperparameters — stage1_epochs=30,
    stage2 50, mofe_lambda=0.1 — and the model's per-expert cox heads,
    reference generate_km_curves.py:160-281). This twin implements the SAME
    reconstruction in torch (train/adapters.py semantics):

      stage 1: loss = mean of the 3 per-expert masked Cox losses (each
        expert's own cox head on samples where that modality is present AND
        labeled), ensemble head OFF, fixed LR, no model selection.
      stage 2: loss = ensemble Cox + mofe_lambda * mean per-expert Cox,
        plateau-on-val-C schedule, patience early stop, best-val-C tracking.
      ONE Adam across both stages (the JAX engine carries opt_state through
      the stage boundary).
    """
    import torch
    from sklearn.model_selection import KFold

    from .torch_reference_named import build_reference_named_simmlm

    split_seed = seed if split_seed is None else split_seed
    torch.manual_seed(seed)
    np.random.seed(seed)

    image = torch.asarray(
        np.moveaxis(np.asarray(arrays["image"], np.float32), -1, 1))
    rna = torch.asarray(np.asarray(arrays["rnaseq"], np.float32))
    clin = torch.asarray(np.asarray(arrays["clinical"], np.float32))
    mask = torch.asarray(np.asarray(arrays["mask"], np.float32))
    time_t = torch.asarray(np.asarray(arrays["time"], np.float32))
    event_t = torch.asarray(np.asarray(arrays["event"], np.float32))
    svalid_t = torch.asarray(np.asarray(arrays["svalid"], np.float32))
    time_np = np.asarray(arrays["time"], np.float64)
    event_np = np.asarray(arrays["event"])

    def expert_cox_mean(experts, b):
        loss = torch.zeros(())
        for m in range(3):
            loss = loss + _cox_loss_masked_torch(
                experts[:, m], time_t[b], event_t[b],
                svalid_t[b] * mask[b][:, m])
        return loss / 3.0

    kfold = KFold(n_splits=n_folds, shuffle=True, random_state=split_seed)
    results = []
    for fold, (tr, va) in enumerate(kfold.split(np.arange(len(time_np))),
                                    start=1):
        model = build_reference_named_simmlm(rna.shape[1],
                                             use_monai=use_monai)
        opt = torch.optim.Adam(model.parameters(), lr=learning_rate,
                               weight_decay=weight_decay)
        tr_idx = torch.asarray(tr)

        def run_batch(b, stage2: bool):
            opt.zero_grad()
            ensemble, experts, _g = model(image[b], rna[b], clin[b], mask[b])
            aux = expert_cox_mean(experts, b)
            if stage2:
                loss = _cox_loss_masked_torch(
                    ensemble, time_t[b], event_t[b], svalid_t[b]
                ) + mofe_lambda * aux
            else:
                loss = aux
            if not loss.requires_grad:
                return None  # every sub-loss degenerate: nothing to step
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), grad_clip)
            opt.step()
            return float(loss.detach())

        # ---- stage 1: expert pretraining, fixed LR, no selection ----
        model.train()
        for epoch in range(1, stage1_epochs + 1):
            perm = tr_idx[torch.randperm(len(tr_idx))]
            for s in range(0, len(perm), batch_size):
                b = perm[s:s + batch_size]
                if len(b) < 2:
                    continue
                run_batch(b, stage2=False)

        # ---- stage 2: ensemble + MoFe, plateau, early stop ----
        sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="max", factor=0.5, patience=5)
        best_c, best_epoch, bad, history = -np.inf, 0, 0, []
        for epoch in range(1, num_epochs + 1):
            model.train()
            perm = tr_idx[torch.randperm(len(tr_idx))]
            ep_losses = []
            for s in range(0, len(perm), batch_size):
                b = perm[s:s + batch_size]
                if len(b) < 2:
                    continue
                loss = run_batch(b, stage2=True)
                if loss is not None:
                    ep_losses.append(loss)

            model.eval()
            with torch.no_grad():
                hv = model(image[va], rna[va], clin[va], mask[va])[0].numpy()
            val_c = harrell_cindex_np(hv, time_np[va], event_np[va])
            sched.step(val_c)
            history.append(dict(epoch=epoch,
                                train_loss=float(np.mean(ep_losses or [0])),
                                val_c_index=val_c))
            if val_c > best_c:
                best_c, best_epoch, bad = val_c, epoch, 0
            else:
                bad += 1
            if patience is not None and bad >= patience:
                break
        results.append(dict(fold=fold, best_c_index=float(best_c),
                            best_epoch=best_epoch, train_size=len(tr),
                            val_size=len(va), history=history))
    return results


def build_torch_mmsurv_twin(rna_dim: int, token_dim: int = 128,
                            cbp_dim: int = 256, num_layers: int = 2,
                            dropout: float = 0.5, use_monai: bool = True):
    """Independent torch implementation of THIS REPO's from-scratch MMsurv
    design (models/mmsurv.py — the reference ships NO code for this family,
    only results metadata): modality encoders -> Compact Bilinear Pooling
    (count-sketch + FFT, SAME fixed seed-1/2 sketch constants as the flax
    module) -> pos-embedded [img, rna, clin, cbp] token sequence ->
    masked pre-norm transformer encoder -> masked mean-pool -> Cox head.
    Init distributions differ from flax where torch defaults differ — a
    dynamics twin compares training behavior, not bit-exact forwards."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from multimodal_survival_prediction_tpu.models.mmsurv import (
        _count_sketch_matrix,
    )

    class CBP(nn.Module):
        def __init__(self, dx, dy, dim_out):
            super().__init__()
            self.dim_out = dim_out
            self.register_buffer(
                "mx", torch.asarray(_count_sketch_matrix(dx, dim_out, 1)))
            self.register_buffer(
                "my", torch.asarray(_count_sketch_matrix(dy, dim_out, 2)))

        def forward(self, x, y):
            fx = torch.fft.rfft(x @ self.mx, dim=-1)
            fy = torch.fft.rfft(y @ self.my, dim=-1)
            out = torch.fft.irfft(fx * fy, n=self.dim_out, dim=-1)
            out = torch.sign(out) * torch.sqrt(torch.abs(out) + 1e-8)
            return out / (out.norm(dim=-1, keepdim=True) + 1e-8)

    class MHA(nn.Module):
        def __init__(self, dim, heads, dropout):
            super().__init__()
            self.h, self.d = heads, dim // heads
            self.q, self.k, self.v, self.o = (nn.Linear(dim, dim)
                                              for _ in range(4))
            self.drop = nn.Dropout(dropout)

        def forward(self, x, pad_mask):  # pad_mask (B, T) 1=real
            B, T, D = x.shape
            split = lambda t: t.view(B, T, self.h, self.d).transpose(1, 2)
            q, k, v = split(self.q(x)), split(self.k(x)), split(self.v(x))
            logits = q @ k.transpose(-1, -2) / self.d ** 0.5
            logits = logits.masked_fill(
                ~(pad_mask[:, None, None, :] > 0), -1e9)
            w = self.drop(torch.softmax(logits, -1))
            return self.o((w @ v).transpose(1, 2).reshape(B, T, D))

    class Block(nn.Module):
        def __init__(self, dim, heads=4, dropout=0.5):
            super().__init__()
            self.ln1 = nn.LayerNorm(dim)
            self.attn = MHA(dim, heads, dropout)
            self.ln2 = nn.LayerNorm(dim)
            self.ff0 = nn.Linear(dim, dim * 2)
            self.drop = nn.Dropout(dropout)
            self.ff1 = nn.Linear(dim * 2, dim)

        def forward(self, tokens, pad_mask):
            tokens = tokens + self.attn(self.ln1(tokens), pad_mask)
            y = self.ff1(self.drop(F.relu(self.ff0(self.ln2(tokens)))))
            return tokens + y

    class MMsurvTwin(nn.Module):
        def __init__(self):
            super().__init__()
            self.image_encoder = (_monai_torch_densenet(token_dim)
                                  if use_monai else _torch_fallback_cnn(
                                      token_dim))
            self.rna_encoder = nn.Sequential(
                nn.Linear(rna_dim, 512), nn.BatchNorm1d(512), nn.ReLU(),
                nn.Dropout(0.3), nn.Linear(512, token_dim), nn.ReLU())
            self.clinical_encoder = nn.Sequential(
                nn.Linear(1, token_dim), nn.ReLU())
            self.cbp = CBP(token_dim, token_dim, cbp_dim)
            self.cbp_proj = nn.Linear(cbp_dim, token_dim)
            self.pos_embed = nn.Parameter(
                0.02 * torch.randn(1, 4, token_dim))
            self.layers = nn.ModuleList(
                [Block(token_dim, dropout=dropout)
                 for _ in range(num_layers)])
            self.drop = nn.Dropout(dropout)
            self.cox_head = nn.Linear(token_dim, 1)

        def forward(self, image, rnaseq, clinical, mask):
            img = self.image_encoder(image)
            if img.dim() > 2:
                img = img.flatten(1)
            rna = self.rna_encoder(rnaseq)
            clin = self.clinical_encoder(clinical)
            cbp_tok = self.cbp_proj(self.cbp(img, rna))
            tokens = torch.stack([img, rna, clin, cbp_tok], 1)
            tokens = tokens + self.pos_embed
            cbp_valid = mask[:, 0:1] * mask[:, 1:2]
            pad_mask = torch.cat([mask, cbp_valid], -1)  # (B, 4)
            tokens = tokens * pad_mask[..., None]
            for layer in self.layers:
                tokens = layer(tokens, pad_mask)
            denom = pad_mask.sum(-1, keepdim=True).clamp(min=1.0)
            pooled = (tokens * pad_mask[..., None]).sum(1) / denom
            return self.cox_head(self.drop(pooled)).squeeze(1)

    return MMsurvTwin()


def _monai_torch_densenet(out_ch):
    from .torch_reference_named import _monai_densenet121_3d

    return _monai_densenet121_3d(out_ch)


def _torch_fallback_cnn(out_ch):
    from .torch_reference_named import _fallback_cnn

    return _fallback_cnn(out_ch)


def run_torch_hazard_cv(
    arrays: dict,
    build_model,
    batch_inputs,
    n_folds: int = 3,
    num_epochs: int = 20,
    batch_size: int = 8,
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-3,
    optimizer: str = "adamw",
    scheduler: str = "cosine",
    patience: int | None = None,
    grad_clip: float | None = 1.0,
    seed: int = 42,
    split_seed: int | None = None,
    init_state_dicts: list | None = None,
):
    """Generic torch twin for the hazard-only multimodal families
    (simple_fusion / flexible_multimodal / final): reference loop semantics
    — AdamW+cosine (simple_fusion.py:391, flexible_multimodal.py) or
    Adam(L2)+ReduceLROnPlateau (final_multimodal.py:350-351), optional
    grad clip / early stop, degenerate-batch skip, pooled per-epoch Harrell
    C-index, best-epoch selection.

    `init_state_dicts`: optional per-fold state dicts (ndarray values) —
    loaded strict so BOTH twins start from identical weights (the
    init-matched protocol of PARITY_TWIN_FLAGSHIP.md).

    `build_model(rna_dim)` -> nn.Module returning a (B,) hazard;
    `batch_inputs(tensors, b)` -> tuple of model inputs for row-index
    tensor `b`, where `tensors` has image (B,1,D,H,W), rnaseq, clinical,
    mask."""
    import torch
    from sklearn.model_selection import KFold

    split_seed = seed if split_seed is None else split_seed
    torch.manual_seed(seed)
    np.random.seed(seed)

    tensors = {
        "image": torch.asarray(
            np.moveaxis(np.asarray(arrays["image"], np.float32), -1, 1)),
        "rnaseq": torch.asarray(np.asarray(arrays["rnaseq"], np.float32)),
        "clinical": torch.asarray(
            np.asarray(arrays["clinical"], np.float32)),
        "mask": torch.asarray(np.asarray(arrays["mask"], np.float32)),
    }
    time_t = torch.asarray(np.asarray(arrays["time"], np.float32))
    event_t = torch.asarray(np.asarray(arrays["event"], np.float32))
    svalid_t = torch.asarray(np.asarray(arrays["svalid"], np.float32))
    time_np = np.asarray(arrays["time"], np.float64)
    event_np = np.asarray(arrays["event"])
    rna_dim = tensors["rnaseq"].shape[1]

    kfold = KFold(n_splits=n_folds, shuffle=True, random_state=split_seed)
    results = []
    for fold, (tr, va) in enumerate(kfold.split(np.arange(len(time_np))),
                                    start=1):
        model = build_model(rna_dim)
        if init_state_dicts is not None:
            model.load_state_dict(
                {k: torch.asarray(np.asarray(v))
                 for k, v in init_state_dicts[fold - 1].items()},
                strict=True)
        if optimizer == "adamw":
            opt = torch.optim.AdamW(model.parameters(), lr=learning_rate,
                                    weight_decay=weight_decay)
        else:
            opt = torch.optim.Adam(model.parameters(), lr=learning_rate,
                                   weight_decay=weight_decay)
        if scheduler == "cosine":
            sched = torch.optim.lr_scheduler.CosineAnnealingLR(
                opt, T_max=num_epochs)
        else:
            sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
                opt, mode="max", factor=0.5, patience=5)
        tr_idx = torch.asarray(tr)
        best_c, best_epoch, bad, history = -np.inf, 0, 0, []
        for epoch in range(1, num_epochs + 1):
            model.train()
            perm = tr_idx[torch.randperm(len(tr_idx))]
            ep_losses = []
            for s in range(0, len(perm), batch_size):
                b = perm[s:s + batch_size]
                if len(b) < 2:
                    continue  # BatchNorm needs >= 2 rows
                opt.zero_grad()
                h = model(*batch_inputs(tensors, b))
                loss = _cox_loss_masked_torch(h, time_t[b], event_t[b],
                                              svalid_t[b])
                if not loss.requires_grad:
                    continue
                loss.backward()
                if grad_clip is not None:
                    torch.nn.utils.clip_grad_norm_(model.parameters(),
                                                   grad_clip)
                opt.step()
                ep_losses.append(float(loss.detach()))

            model.eval()
            with torch.no_grad():
                va_t = torch.asarray(va)
                hv = model(*batch_inputs(tensors, va_t)).numpy()
            val_c = harrell_cindex_np(hv, time_np[va], event_np[va])
            if scheduler == "cosine":
                sched.step()
            else:
                sched.step(val_c)
            history.append(dict(epoch=epoch,
                                train_loss=float(np.mean(ep_losses or [0])),
                                val_c_index=val_c))
            if val_c > best_c:
                best_c, best_epoch, bad = val_c, epoch, 0
            else:
                bad += 1
            if patience is not None and bad >= patience:
                break
        results.append(dict(fold=fold, best_c_index=float(best_c),
                            best_epoch=best_epoch, train_size=len(tr),
                            val_size=len(va), history=history))
    return results


def run_torch_rnaseq_cv(
    X: np.ndarray,
    time_arr: np.ndarray,
    event_arr: np.ndarray,
    n_folds: int = 3,
    num_epochs: int = 50,
    batch_size: int = 16,
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-3,
    seed: int = 42,
    split_seed: int | None = None,
):
    """Full torch CV run. Returns list of per-fold dicts
    (fold, best_c_index, best_epoch, history).

    `seed` drives weight init + shuffles (torch RNG); `split_seed` (default:
    same) drives the sklearn KFold — kept separate so parity runs can vary
    the init seed while holding the folds bit-identical to the JAX side."""
    import torch
    from sklearn.model_selection import KFold

    split_seed = seed if split_seed is None else split_seed
    torch.manual_seed(seed)
    np.random.seed(seed)
    X_t = torch.asarray(np.asarray(X, np.float32))
    time_t = torch.asarray(np.asarray(time_arr, np.float32))
    event_t = torch.asarray(np.asarray(event_arr, np.float32))

    kfold = KFold(n_splits=n_folds, shuffle=True, random_state=split_seed)
    results = []
    for fold, (tr, va) in enumerate(kfold.split(np.arange(len(X))), start=1):
        model = build_torch_rnaseq_model(X.shape[1])
        opt = torch.optim.AdamW(model.parameters(), lr=learning_rate,
                                weight_decay=weight_decay)
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, T_max=num_epochs)
        tr_idx = torch.asarray(tr)
        best_c, best_epoch, history = -np.inf, 0, []
        for epoch in range(1, num_epochs + 1):
            model.train()
            perm = tr_idx[torch.randperm(len(tr_idx))]
            ep_losses = []
            for s in range(0, len(perm), batch_size):
                b = perm[s:s + batch_size]
                # degenerate-batch guard (reference skips <2 samples /
                # 0 events, SURVEY §2.5; also keeps BatchNorm happy)
                if len(b) < 2 or float(event_t[b].sum()) == 0:
                    continue
                opt.zero_grad()
                h = model(X_t[b]).squeeze(1)
                loss = cox_loss_torch(h, time_t[b], event_t[b])
                loss.backward()
                opt.step()
                ep_losses.append(float(loss))
            sched.step()

            model.eval()
            with torch.no_grad():
                hv = model(X_t[va]).squeeze(1).numpy()
            val_c = harrell_cindex_np(hv, time_arr[va], event_arr[va])
            history.append(dict(epoch=epoch,
                                train_loss=float(np.mean(ep_losses or [0])),
                                val_c_index=val_c))
            if val_c > best_c:
                best_c, best_epoch = val_c, epoch
        results.append(dict(fold=fold, best_c_index=float(best_c),
                            best_epoch=best_epoch, train_size=len(tr),
                            val_size=len(va), history=history))
    return results
