"""Dataset-paper figure tooling (fig. 6/7 dipole parity, fig. 9 NMR panel,
IR-spectrum-from-parquet).

One CLI replacing the reference's four figure scripts
(reference paper_replication/scripts_ir_nmr_multimodal_comp_spectra_dataset/
scripts_dipole_true_pred_error_fig6_and_fig7/{collect_y_pred_y_true,
plot_figure6,plot_figure7}.py, scripts_nmr_fig_9/
plot_H_NMR_C_NMR_selected_ids.py, scripts_ir_spectra/
make_IR_plot_from_parquet.py) on pyarrow + matplotlib.

Deviation: the reference renders 2D molecule drawings in the fig. 9 centre
column with RDKit Draw; rdkit is not available here, so the centre column
shows the canonical SMILES (via the in-repo chem engine) instead.

Subcommands:
    collect        stack per-run y_pred.npy / y_true.npy evaluation arrays
    figure6        2x2 parity plot: norms + xyz components, frames vs molecules
    figure7        single-panel xyz parity plot for selected molecules
    nmr-panel      per-molecule 1H / structure / 13C peak comparison rows
    ir-plot        normalized IR spectrum of one record from parquet shards
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.lines import Line2D  # noqa: E402

DIPOLE_LABELS = ["dipole-x", "dipole-y", "dipole-z"]
DIPOLE_COLORS = ["tab:red", "tab:green", "tab:blue"]


def collect(args) -> None:
    """Stack per-run EVAL arrays listed in a run-id file
    (reference collect_y_pred_y_true.py behaviour)."""
    run_ids = [
        line.strip()
        for line in Path(args.list).read_text().splitlines()
        if line.strip()
    ]
    for kind in ("y_pred", "y_true"):
        arrays = [
            np.load(Path(args.prefix) / run_id / args.postfix / f"{kind}.npy")
            for run_id in run_ids
        ]
        stacked = np.vstack(arrays)
        out = Path(f"{args.out_prefix}_{kind}.npy")
        np.save(out, stacked)
        print(stacked.shape, out)


def _parity_axis(ax, true, pred, title, limit, *, norm_color=None,
                 xlabel="True Value", ylabel=None):
    if norm_color is not None:  # single-series norm scatter
        ax.scatter(true, pred, alpha=0.5, color=norm_color, s=10)
    else:  # per-component xyz scatter
        for i in range(3):
            ax.scatter(true[:, i], pred[:, i], label=DIPOLE_LABELS[i],
                       alpha=0.5, s=10, color=DIPOLE_COLORS[i])
        ax.legend(fontsize=18)
    ax.plot([-4, 4], [-4, 4], "k--")
    ax.set_title(title, fontsize=22)
    ax.set_xlabel(xlabel, fontsize=22)
    if ylabel:
        ax.set_ylabel(ylabel, fontsize=22)
    ax.grid(True)
    ax.set_aspect("equal", adjustable="box")
    ax.set_xlim(*limit)
    ax.set_ylim(*limit)
    ax.tick_params(axis="both", labelsize=18)


def figure6(args) -> None:
    """2x2 dipole parity: norm (top) and xyz components (bottom) for unseen
    frames (left) vs unseen molecules (right)."""
    pred_f = np.load(f"{args.frames_prefix}_y_pred.npy")
    true_f = np.load(f"{args.frames_prefix}_y_true.npy")
    pred_m = np.load(f"{args.molecules_prefix}_y_pred.npy")
    true_m = np.load(f"{args.molecules_prefix}_y_true.npy")

    fig, axs = plt.subplots(2, 2, figsize=(12, 12))
    _parity_axis(axs[0, 0], np.linalg.norm(true_f, axis=1),
                 np.linalg.norm(pred_f, axis=1), "Unseen Frames – Norm",
                 (-0.1, 3.4), norm_color="darkorange",
                 xlabel="True Norm", ylabel="Predicted Norm")
    _parity_axis(axs[0, 1], np.linalg.norm(true_m, axis=1),
                 np.linalg.norm(pred_m, axis=1), "Unseen Molecules – Norm",
                 (-0.1, 3.4), norm_color="steelblue", xlabel="True Norm")
    _parity_axis(axs[1, 0], true_f, pred_f, "Unseen Frames – XYZ",
                 (-2.9, 2.9), ylabel="Predicted Value")
    _parity_axis(axs[1, 1], true_m, pred_m, "Unseen Molecules – XYZ",
                 (-2.9, 2.9))
    fig.tight_layout()
    fig.savefig(args.out, dpi=args.dpi)
    plt.close(fig)
    print(args.out)


def figure7(args) -> None:
    """Large-marker xyz parity plot for a selected-molecule subset."""
    pred = np.load(f"{args.prefix}_y_pred.npy")
    true = np.load(f"{args.prefix}_y_true.npy")
    ff = 3.2
    fig = plt.figure(figsize=(10, 10))
    for i in range(3):
        plt.scatter(true[:, i], pred[:, i], label=DIPOLE_LABELS[i],
                    alpha=0.6, s=100, color=DIPOLE_COLORS[i])
    plt.plot([-ff, ff], [-ff, ff], "k--", linewidth=2)
    plt.xlabel("True Value", fontsize=38)
    plt.ylabel("Predicted Value", fontsize=38)
    plt.xticks(fontsize=32)
    plt.yticks(fontsize=32)
    plt.legend(fontsize=32)
    plt.grid(True)
    plt.axis("equal")
    plt.xlim(-ff, ff)
    plt.ylim(-ff, ff)
    fig.tight_layout()
    fig.savefig(args.out, dpi=args.dpi, bbox_inches="tight")
    plt.close(fig)
    print(args.out)


def _peak_row(ax, exp_peaks, comp_peaks, x_range):
    """One half-height red (exp) / dashed-blue (computed) peak comparison
    axis; ppm axis runs right-to-left as in the paper."""
    for peak in exp_peaks:
        ax.vlines(x=peak, ymin=0.5, ymax=1.0, color="red", linewidth=2)
    for peak in comp_peaks:
        ax.vlines(x=peak, ymin=0.0, ymax=0.5, color="blue",
                  linestyle="--", linewidth=1.5)
    ax.set_xlim(x_range[1], x_range[0])
    ax.set_ylim(0, 1)
    ax.set_yticks([])
    ax.tick_params(axis="x", labelsize=16)


def nmr_panel(args) -> None:
    """Per-molecule rows: 1H-NMR peaks | structure label | 13C-NMR peaks,
    experimental (red, top half) vs CPMD-averaged (blue dashed, bottom)."""
    import pyarrow.parquet as pq

    table = pq.read_table(args.nmr_parquet)
    records = table.to_pylist()
    # Dedupe by SMILES, first occurrence (reference lines 46-57).
    seen: set = set()
    records = [r for r in records
               if not (r["smiles"] in seen or seen.add(r["smiles"]))]

    if args.exp_json:
        exp = {r["smiles"]: r for r in json.loads(Path(args.exp_json).read_text())}
    else:
        # Placeholder rows so the figure renders without experimental data
        # (reference lines 24-30; -999 keeps the marks off-axis).
        exp = {r["smiles"]: {"h_nmr_peaks": [-999], "c_nmr_peaks": [-999]}
               for r in records}
    records = [r for r in records if r["smiles"] in exp]

    indices = [int(i) for i in args.indices.split(",")]
    n = len(indices)
    fig, axes = plt.subplots(nrows=n, ncols=3, figsize=(14, 2.5 * n),
                             squeeze=False)
    for row, idx in enumerate(indices):
        rec = records[idx]
        smiles = rec["smiles"]
        averaged = rec["averaged_frames"]
        _peak_row(axes[row, 0], exp[smiles]["h_nmr_peaks"],
                  averaged["h_nmr_peaks_grouped_frame_ave"], (0, 12))
        # Centre column: canonical SMILES label (rdkit-free deviation).
        ax_mid = axes[row, 1]
        ax_mid.axis("off")
        try:
            from multimodalanalytical_tpu.chem import canonicalize
            label = canonicalize(smiles) or smiles
        except Exception:
            label = smiles
        ax_mid.text(0.5, 0.5, label, fontsize=12, ha="center", va="center",
                    wrap=True, transform=ax_mid.transAxes)
        _peak_row(axes[row, 2], exp[smiles]["c_nmr_peaks"],
                  averaged["c_nmr_peaks_grouped_frame_ave"], (0, 220))
        if row == n - 1:
            axes[row, 0].set_xlabel("Chemical Shift (ppm)", fontsize=20)
            axes[row, 2].set_xlabel("Chemical Shift (ppm)", fontsize=20)
        if row == 0:
            handles = [
                Line2D([0], [0], color="red", lw=2, label="Exp."),
                Line2D([0], [0], color="blue", linestyle="--", lw=1.5,
                       label="Comp."),
            ]
            for col, title in ((0, "1H-NMR"), (2, "13C-NMR")):
                axes[row, col].legend(handles=handles, loc="upper left",
                                      fontsize=12, handlelength=1.0,
                                      handletextpad=0.5, borderpad=0.3)
                axes[row, col].text(0.01, 1.08, title, fontsize=18,
                                    transform=axes[row, col].transAxes,
                                    va="bottom")
    fig.tight_layout(h_pad=0.6)
    fig.savefig(args.out, dpi=args.dpi)
    plt.close(fig)
    print(args.out)


def ir_plot(args) -> None:
    """Max-normalized IR spectrum of one record across parquet shards."""
    import pyarrow.parquet as pq

    files = sorted(Path(args.parquet_dir).glob("*.parquet"))
    if not files:
        raise SystemExit(f"no parquet files in {args.parquet_dir}")
    remaining = args.index
    record = None
    for f in files:
        t = pq.read_table(f)
        if remaining < t.num_rows:
            record = t.slice(remaining, 1).to_pylist()[0]
            break
        remaining -= t.num_rows
    if record is None:
        raise SystemExit(f"index {args.index} beyond dataset")

    freq = np.asarray(record["Frequency(cm^-1)"], dtype=np.float64)
    spectrum = np.asarray(record["ir_spectra"], dtype=np.float64)
    fact = np.max(np.abs(spectrum))
    fig = plt.figure(figsize=(10, 6))
    plt.plot(freq, spectrum / fact, label=record["smiles"], color="blue",
             linewidth=1)
    plt.xlabel("Frequency (cm^-1)", fontsize=14)
    plt.ylabel("IR Spectra [arb. units]", fontsize=14)
    plt.xlim(100, 4000)
    plt.legend()
    plt.grid(True)
    out = Path(args.out_dir) / f"ir_spectra_id_{record.get('id', args.index)}.png"
    fig.savefig(out, dpi=args.dpi, bbox_inches="tight")
    plt.close(fig)
    print(out)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("collect", help="stack per-run y_pred/y_true arrays")
    p.add_argument("--list", required=True, help="file of run ids, one per line")
    p.add_argument("--prefix", required=True, help="runs root directory")
    p.add_argument("--postfix", default="EVAL/t40", help="subdir holding the npy files")
    p.add_argument("--out_prefix", required=True)
    p.set_defaults(func=collect)

    p = sub.add_parser("figure6", help="2x2 dipole parity figure")
    p.add_argument("--frames_prefix", required=True)
    p.add_argument("--molecules_prefix", required=True)
    p.add_argument("--out", default="figure6.png")
    p.add_argument("--dpi", type=int, default=600)
    p.set_defaults(func=figure6)

    p = sub.add_parser("figure7", help="selected-molecules xyz parity figure")
    p.add_argument("--prefix", required=True)
    p.add_argument("--out", default="figure7.png")
    p.add_argument("--dpi", type=int, default=600)
    p.set_defaults(func=figure7)

    p = sub.add_parser("nmr-panel", help="1H/structure/13C comparison rows")
    p.add_argument("--nmr_parquet", required=True)
    p.add_argument("--exp_json", default=None)
    p.add_argument("--indices", default="0,2,10,12,14")
    p.add_argument("--out", default="nmr_with_structure.png")
    p.add_argument("--dpi", type=int, default=600)
    p.set_defaults(func=nmr_panel)

    p = sub.add_parser("ir-plot", help="one IR spectrum from parquet shards")
    p.add_argument("--parquet_dir", required=True)
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--out_dir", default=".")
    p.add_argument("--dpi", type=int, default=400)
    p.set_defaults(func=ir_plot)

    args = parser.parse_args()
    args.func(args)


if __name__ == "__main__":
    main()
