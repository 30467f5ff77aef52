#!/usr/bin/env python
"""CPMD input generation for the computational-spectra dataset workflow.

One generator covers the reference's two near-duplicate scripts
(scripts_ir_nmr_multimodal_comp_spectra_dataset/scripts/
make_input_cpmd_from_xyz.py and make_input_cpmd_with_vdW_from_xyz.py):
PBE geometry optimization and NMR linear-response inputs, optionally with
Grimme vdW corrections (``--vdw``). The molecule is centered in a cubic
cell sized to its extent + 10 A, rounded up to the next 5 A, matching the
reference's box construction.

Usage:
  python cpmd_inputs.py --xyz conf_0.xyz [--geop yes] [--nmr yes]
                        [--both no] [--vdw]
"""

from __future__ import annotations

import argparse
import math
from pathlib import Path
from typing import Dict, List, Tuple

# Goedecker-Teter-Hutter pseudopotential names per element (PBE set).
PSEUDO: Dict[str, str] = {
    "H": "H-q1-pbe", "B": "B-q3-pbe", "C": "C-q4-pbe", "N": "N-q5-pbe",
    "O": "O-q6-pbe", "F": "F-q7-pbe", "Si": "Si-q4-pbe", "P": "P-q5-pbe",
    "S": "S-q6-pbe", "Cl": "Cl-q7-pbe", "As": "As-q5-pbe", "Se": "Se-q6-pbe",
    "Br": "Br-q7-pbe", "I": "I-q7-pbe",
}

GEOP_TEMPLATE = """&CPMD
OPTIMIZE GEOMETRY
CONVERGENCE ORBITALS
1.0E-6
PCG MINIMIZE
MAXSTEPS
1000
PRINT FORCES ON
PRINT
100{vdw_flag}
&END

&SYSTEM
  ANGSTROM
  SYMMETRY
    1
  CELL
  {cell} 1.0  0.0 0.0 0.0
  CUTOFF
    100.
&END
{vdw_block}
&DFT
 FUNCTIONAL PBE
&END

&ATOMS
{atoms}
&END
"""

NMR_TEMPLATE = """&CPMD
LINEAR RESPONSE
{restart}
CONVERGENCE ORBITALS
1.d-6
PCG MINIMIZE{vdw_flag}
&END

&SYSTEM
  ANGSTROM
  SYMMETRY
    1
  CELL
  {cell} 1.0  0.0 0.0 0.0
  CUTOFF
    100.
&END

&RESP
 NMR
 CONVERGENCE
 1.d-6
 OVERLAP
 0.1
 CURRENT
 PSI0
 RHO0
&END
{vdw_block}
&DFT
 FUNCTIONAL PBE
&END

&ATOMS
{atoms}
&END
"""

VDW_BLOCK = """
&VDW
 VDW PARAMETERS
 ALL GRIMME
 VDW-CUTOFF
 1.0E-2
 VDW-CELL
 0 0 0
 S6GRIM
 {functional}
&END
"""


def read_xyz(path: Path) -> Tuple[List[str], List[List[float]]]:
    lines = path.read_text().splitlines()
    natoms = int(lines[0].split()[0])
    elements, coords = [], []
    for line in lines[2:2 + natoms]:
        parts = line.split()
        elements.append(parts[0])
        coords.append([float(x) for x in parts[1:4]])
    return elements, coords


def cubic_cell(coords: List[List[float]]) -> float:
    """Extent + 10 A, rounded up to the next 5 A (reference box policy)."""
    mins = [min(c[i] for c in coords) for i in range(3)]
    maxs = [max(c[i] for c in coords) for i in range(3)]
    extent = max(maxs[i] - mins[i] for i in range(3))
    return float(math.ceil((int(extent + 10.0)) / 5) * 5)


def centered(coords: List[List[float]], cell: float) -> List[List[float]]:
    center = [sum(c[i] for c in coords) / len(coords) for i in range(3)]
    return [[c[i] - center[i] + cell / 2.0 for i in range(3)] for c in coords]


def atoms_section(elements: List[str], coords: List[List[float]]) -> str:
    """Element-grouped &ATOMS body with pseudopotential headers."""
    out = []
    for element in sorted(set(elements)):
        if element not in PSEUDO:
            raise ValueError(f"no pseudopotential mapped for element {element}")
        rows = [c for e, c in zip(elements, coords) if e == element]
        out.append(f"*{PSEUDO[element]}")
        out.append(" LMAX=S")
        out.append(f" {len(rows)}")
        for c in rows:
            out.append(f" {c[0]:12.6f} {c[1]:12.6f} {c[2]:12.6f}")
        out.append("")
    return "\n".join(out)


def generate(xyz_path: Path, geop: bool, nmr: bool, both: bool,
             vdw: bool) -> List[Path]:
    elements, coords = read_xyz(xyz_path)
    cell = cubic_cell(coords)
    atoms = atoms_section(elements, centered(coords, cell))
    written = []
    vdw_flag = "\nVDW CORRECTION ON" if vdw else ""

    if geop or both:
        body = GEOP_TEMPLATE.format(
            cell=cell, atoms=atoms, vdw_flag=vdw_flag,
            vdw_block=VDW_BLOCK.format(functional="PBE") if vdw else "",
        )
        path = xyz_path.with_name(xyz_path.stem + "_geop_cpmd.in")
        path.write_text(body)
        written.append(path)

    if nmr or both:
        restart = ("RESTART WAVEFUNCTION COORDINATES LATEST" if both
                   else "restart wavefunction coordinates latest")
        body = NMR_TEMPLATE.format(
            cell=cell, atoms=atoms, restart=restart, vdw_flag=vdw_flag,
            vdw_block=VDW_BLOCK.format(functional="PBE0") if vdw else "",
        )
        path = xyz_path.with_name(xyz_path.stem + "_nmr_cpmd.in")
        path.write_text(body)
        written.append(path)
    return written


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--xyz", required=True, type=Path)
    parser.add_argument("--geop", default="yes", choices=["yes", "no"])
    parser.add_argument("--nmr", default="yes", choices=["yes", "no"])
    parser.add_argument("--both", default="no", choices=["yes", "no"],
                        help="chain geop then NMR in one job (NMR restarts "
                             "from the optimizer's wavefunction)")
    parser.add_argument("--vdw", action="store_true",
                        help="Grimme vdW-corrected variants")
    args = parser.parse_args()

    written = generate(
        args.xyz, geop=args.geop == "yes", nmr=args.nmr == "yes",
        both=args.both == "yes", vdw=args.vdw,
    )
    for path in written:
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
