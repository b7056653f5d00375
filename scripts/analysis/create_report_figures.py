#!/usr/bin/env python
"""Report figures (parity with reference scripts/analysis/
create_report_figures.py): sample CT mid-slices, modality-availability bars +
survival-status pie, whole-cohort Kaplan-Meier with median annotation, and
the model-comparison bars."""

from common import base_parser, load_table_or_none


def main():
    args = base_parser(__doc__).parse_args()
    from pathlib import Path

    import numpy as np

    from multimodal_survival_prediction_tpu.analysis import collect_results
    from multimodal_survival_prediction_tpu.analysis.figures import (
        ct_slice_gallery,
        km_plot,
        modality_availability,
        model_comparison_main,
    )
    from multimodal_survival_prediction_tpu.data import read_nifti
    from multimodal_survival_prediction_tpu.ops.km import kaplan_meier

    out = Path(args.out_dir or Path(args.results_root) / "report_figures")
    table = load_table_or_none(args.data_root)
    if table is None:
        print("no matching table found; run preprocessing (or --synthetic "
              "training) first")
        return

    modality_availability(table, out / "modality_availability.png")

    # whole-cohort KM (labeled patients)
    lab = table[table.has_survival]
    if len(lab):
        km = kaplan_meier(lab.survival_time.to_numpy(),
                          lab.survival_status.to_numpy())
        med = km.median_survival_time
        km_plot({"cohort": km}, out / "cohort_km.png",
                title=f"Cohort KM (median={med:.0f}d)" if np.isfinite(med)
                else "Cohort KM")

    # 3 random CT mid-slices (seed 42 like the reference's sampling)
    imaged = table[table.has_imaging]
    if len(imaged):
        rng = np.random.default_rng(42)
        pick = imaged.sample(min(3, len(imaged)), random_state=42)
        vols, labels = [], []
        for _, row in pick.iterrows():
            try:
                vols.append(read_nifti(row.nifti_path).data)
                labels.append(row.patient_id)
            except Exception:
                pass
        if vols:
            ct_slice_gallery(vols, out / "sample_ct_slices.png", labels)

    df = collect_results(args.results_root)
    if len(df):
        model_comparison_main(df, out / "model_comparison.png")
    print(f"figures -> {out}")


if __name__ == "__main__":
    main()
