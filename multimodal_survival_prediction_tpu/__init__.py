"""TPU-native multimodal survival-prediction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``baek0203/multimodal_survival_prediction`` reference pipeline (TCGA-OV
multimodal survival prediction): CT / RNA-seq / clinical encoders, Cox
partial-likelihood training under K-fold CV, partial-modality gating,
mixture-of-modality-experts, Kaplan-Meier / C-index evaluation, and the
full download → preprocess → train → analyze pipeline.

Design stance (vs. the reference):
  * single importable library + thin entry-point scripts (the reference is
    copy-pasted per-script code, see reference scripts/training/*.py),
  * device-resident, preprocess-once input pipeline (the reference re-reads
    and re-resamples every NIfTI from host disk every epoch,
    reference partial_modality_training.py:83-158),
  * whole-epoch jitted ``lax.scan`` training steps on TPU,
  * batch-DP / tensor-parallel execution over a ``jax.sharding.Mesh``,
  * fused Pallas/XLA kernels for the CT resample+normalize hot path.
"""

__version__ = "0.1.0"
