"""Cross-resolution similarity tooling.

Produces the `*_reduced.pdb` artifacts and the `similarity.txt` report the
reference ships in output_models/ (made there by an out-of-repo tool; the
protocol was reverse-engineered and verified in metrics.cross_resolution_
similarity: bead-pair-averaged reduction, distance-set Spearman, and
scale-optimal dRMSD — reproduces the published chr12/13/21 numbers).
"""

from __future__ import annotations

import glob as _glob
import os
import re
from typing import Dict, Optional, Tuple

from chromosome3d_tpu.io.pdb import read_ca_pdb, reduce_model, write_reduced_pdb
from chromosome3d_tpu.metrics import cross_resolution_similarity


def write_reduced_model(
    hi_res_pdb: str, out_pdb: Optional[str] = None, factor: int = 2
) -> str:
    """Emit the bead-pair-averaged reduced model of a high-res PDB, in the
    published chain-B/occ-0.20/b-10.00 reduced layout (io.pdb.write_reduced_pdb)."""
    coords = read_ca_pdb(hi_res_pdb)
    red = reduce_model(coords, factor)
    if out_pdb is None:
        out_pdb = hi_res_pdb.replace(".pdb", "_reduced.pdb")
    write_reduced_pdb(out_pdb, red)
    return out_pdb


def similarity_report(
    pairs: Dict[str, Tuple[str, str]], out_path: str, factor: int = 2
) -> Dict[str, Tuple[float, float]]:
    """Write a similarity.txt-format report.

    pairs: name -> (hi_res_pdb, lo_res_pdb). Emits per entry:
        <name>
        Spearman correlation: <rho>
        RMSD: <rmsd>
        <blank>
    matching output_models/similarity.txt:1-75. Returns the numbers."""
    results = {}
    with open(out_path, "w") as f:
        for name, (hi, lo) in pairs.items():
            rho, rmsd = cross_resolution_similarity(
                read_ca_pdb(hi), read_ca_pdb(lo), factor
            )
            results[name] = (rho, rmsd)
            f.write(f"{name}\n")
            f.write(f"Spearman correlation: {rho}\n")
            f.write(f"RMSD: {rmsd}\n\n")
    return results


def pair_outputs_by_chromosome(
    output_dir: str, hi_tag: str = "500kb", lo_tag: str = "1mb"
) -> Dict[str, Tuple[str, str]]:
    """Find best-model (rank01 or model1) PDBs for each chromosome at both
    resolutions under a run_genome output tree."""
    best: Dict[str, Dict[str, str]] = {}
    for sub in sorted(os.listdir(output_dir)):
        m = re.match(r"(chr\w+?)_(\w+)$", sub)
        if not m:
            continue
        chrom, res = m.groups()
        subdir = os.path.join(output_dir, sub)
        if not os.path.isdir(subdir):
            continue
        # rank files are tagged by the run's alpha (emit_artifacts: _rank01_a05
        # for the default alpha 0.5, _rank01_a11 for 1.1, ...) — glob the tag
        # rather than assuming one; fall back to the NOE-ranked model1 only
        # when no Spearman-ranked file exists.
        ranked = sorted(
            p
            for p in _glob.glob(os.path.join(subdir, f"{sub}_rank01_*.pdb"))
            if "_reduced" not in os.path.basename(p)
        )
        for path in ranked + [os.path.join(subdir, f"{sub}_model1.pdb")]:
            if os.path.exists(path):
                best.setdefault(chrom, {})[res] = path
                break
    pairs = {}
    for chrom, by_res in sorted(best.items()):
        if hi_tag in by_res and lo_tag in by_res:
            pairs[f"{chrom}_{hi_tag}_vs_{lo_tag}"] = (by_res[hi_tag], by_res[lo_tag])
    return pairs
