"""Freeze the EM-trained Fellegi-Sunter m/u into catalog_ext.py.

Runs the unsupervised EM fit (operators.joins.fs_em) over the sf0.001
document candidate pairs' agreement-pattern histogram — the exact
pipeline ext_record_linkage_trained runs at query time — and REWRITES
the _FS_EM_M_PPM / _FS_EM_U_PPM literals in pigpen_spark/catalog_ext.py
(written from inside the script, never scraped from stdout: the round-6
progress-bar lesson).  Substitution is line-anchored with a match-count
check and a compile() gate before overwriting (the freeze_wordpiece
hardening).  The decision thresholds (_FS_EM_UPPER/_FS_EM_LOWER) are
NOT rewritten: they are hand-placed at the discriminating score levels
of the frozen weights (doc-linkage doctrine) — re-place them after any
re-freeze that changes the weights materially.

Usage:  python tools/freeze_fs_em.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pigpen_spark.session import get_spark
    spark = get_spark("freeze-fs-em")
    spark.sparkContext.setLogLevel("ERROR")

    from pigpen_spark.catalog_ext import _doc_em_agreements, _doc_em_pairs
    from pigpen_spark.operators.joins import agreement_histogram, fs_em

    pairs = _doc_em_pairs(spark, sf_dir)
    hist = agreement_histogram(pairs, _doc_em_agreements())
    m_ppm, u_ppm, p = fs_em(hist)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "pigpen_spark", "catalog_ext.py")
    src = open(path).read()
    src, n_m = re.subn(r"^_FS_EM_M_PPM = .*$",
                       f"_FS_EM_M_PPM = {m_ppm}", src, count=1, flags=re.M)
    src, n_u = re.subn(r"^_FS_EM_U_PPM = .*$",
                       f"_FS_EM_U_PPM = {u_ppm}", src, count=1, flags=re.M)
    if n_m != 1 or n_u != 1:
        raise SystemExit(
            f"freeze_fs_em: expected exactly one _FS_EM_M_PPM and one "
            f"_FS_EM_U_PPM line, matched {n_m}/{n_u} — refusing to write")
    compile(src, path, "exec")  # syntax check BEFORE overwriting
    open(path, "w").write(src)
    print(f"froze m={m_ppm} u={u_ppm} (p={p:.6f}) from {sf_dir}")


if __name__ == "__main__":
    main()
