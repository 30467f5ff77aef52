#!/usr/bin/env python
"""IR spectrum from an MD dipole trajectory.

Implements the dataset paper's spectrum pipeline (reference
scripts_ir_nmr_multimodal_comp_spectra_dataset/scripts_ir_spectra/
compute_ir_spectra_from_dipole_dipole_autocorrelation.py, itself after
E. Braun, doi.org/10.5281/zenodo.154672):

  dipole(t) -> dipole autocorrelation (FFT) -> Blackman-damped tail
           -> DCT-I lineshape -> harmonic field + quantum corrections
           -> relative IR intensities over wavenumber.

Quantum correction per Ramirez et al. (doi.org/10.1021/jp034788u).

Usage: python ir_from_dipole.py <dipole.npy> <md_timestep_fs>
Writes autocorr_{orig,damp}_<stem>.txt, IR-data_auto_damped_<stem>.csv and
plot_autocorr_<stem>.png next to the input.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

BOLTZMANN = 1.38064852e-23        # J / K
LIGHTSPEED = 299792458.0          # m / s
HBAR = 1.05457180013e-34          # J s
TEMPERATURE = 300.0               # K


def autocorrelation(series: np.ndarray) -> np.ndarray:
    """Unbiased autocorrelation of a 1-D series via zero-padded FFT."""
    n = len(series)
    padded = np.zeros(2 * n)
    padded[:n] = series
    spectrum = np.fft.rfft(padded)
    corr = np.fft.irfft(spectrum * np.conj(spectrum))[:n]
    return corr / np.arange(n, 0, -1)


def dipole_autocorrelation(dipole: np.ndarray) -> np.ndarray:
    """Summed x/y/z dipole autocorrelation, truncated to n/2 - 1 points."""
    n_keep = dipole.shape[0] // 2 - 1
    total = sum(autocorrelation(dipole[:, axis]) for axis in range(3))
    return total[:n_keep]


def blackman_damp(values: np.ndarray, fraction: float = 0.5) -> np.ndarray:
    """Damp the trailing ``fraction`` of the signal with a Blackman window
    (suppresses truncation ringing in the lineshape)."""
    n = len(values)
    k = np.arange(n)
    window = (0.42 - 0.5 * np.cos(2 * np.pi * k / (n - 1))
              + 0.08 * np.cos(4 * np.pi * k / (n - 1)))
    damped = np.ones(n)
    start = int((1.0 - fraction) * n)
    damped[start:] = window[start:]
    return values * damped


def dct_one(values: np.ndarray) -> np.ndarray:
    """Type-I DCT via a mirrored FFT (scipy-free)."""
    n = len(values)
    mirrored = np.concatenate([values, values[-2:0:-1]])
    return np.fft.rfft(mirrored).real[:n]


def ir_spectrum(autocorr: np.ndarray, timestep_fs: float):
    """Returns (wavenumbers cm^-1, lineshape, field, quantum, spectrum,
    spectrum_qm); intensities are relative."""
    timestep = timestep_fs * 1e-15
    lineshape = dct_one(autocorr)[1:]
    freqs = np.linspace(0.0, 0.5 / timestep, len(autocorr))[1:]
    wavenumbers = freqs / (100.0 * LIGHTSPEED)
    boltz_ratio = HBAR * freqs / (BOLTZMANN * TEMPERATURE)
    field = freqs * (1.0 - np.exp(-boltz_ratio))
    quantum = freqs / (1.0 - np.exp(-boltz_ratio))
    spectrum = lineshape * field
    return wavenumbers, lineshape, field, quantum, spectrum, spectrum * quantum


def main() -> None:
    if len(sys.argv) < 3:
        print("Usage: python ir_from_dipole.py <dipole.npy> <timestep_fs>")
        raise SystemExit(1)
    dipole_path = Path(sys.argv[1])
    timestep_fs = float(sys.argv[2])
    dipole = np.load(dipole_path)
    stem = dipole_path.stem
    out_dir = dipole_path.parent
    print(f"reading {dipole_path}: {dipole.shape[0]} frames, "
          f"dt = {timestep_fs} fs")

    autocorr = dipole_autocorrelation(dipole)
    time_fs = np.arange(len(autocorr)) * timestep_fs
    np.savetxt(out_dir / f"autocorr_orig_{stem}.txt",
               np.column_stack((time_fs, autocorr)),
               header="Time(fs) Autocorrelation(e*Ang)")

    damped = blackman_damp(autocorr, fraction=0.5)
    np.savetxt(out_dir / f"autocorr_damp_{stem}.txt",
               np.column_stack((time_fs, damped)),
               header="Time(fs) Autocorrelation(e*Ang)", comments="",
               delimiter=" ")

    columns = ir_spectrum(damped, timestep_fs)
    np.savetxt(
        out_dir / f"IR-data_auto_damped_{stem}.csv",
        np.column_stack(columns),
        header="Frequency(cm^-1), Lineshape, Field_description, "
               "Quantum_correction, Spectra, Spectra_qm",
        delimiter=",",
    )

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 6))
        ax.plot(time_fs, autocorr, "--", label="original", color="tab:blue")
        ax.plot(time_fs, damped, label="Blackman-damped", color="tab:green")
        ax.set_xlabel("Time (fs)")
        ax.set_ylabel("Dipole autocorrelation")
        ax.grid(True)
        ax.legend()
        fig.savefig(out_dir / f"plot_autocorr_{stem}.png", dpi=300,
                    bbox_inches="tight")
        plt.close(fig)
    except Exception as exc:  # pragma: no cover - plotting optional
        print(f"plotting skipped: {exc}")
    print(f"wrote spectra artifacts for {stem} to {out_dir}")


if __name__ == "__main__":
    main()
