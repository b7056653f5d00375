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
