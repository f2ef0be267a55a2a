"""Materials Project dataset downloader.

Reference: query_matproj.py — query MPRester by anonymous formula / chemical
system, write CIFs + a property CSV.  This environment has no network
egress and no pymatgen; the CLI degrades gracefully:

- with pymatgen + network available it performs the query;
- otherwise it exits with a clear message pointing at the offline paths
  (icsg3d_tpu.apps.voxelize --cifs on an existing CIF directory, or
  --synthetic for generated datasets).

The reference built its query dict with ``eval`` on user input
(query_matproj.py:37) — here the criteria are parsed safely.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

# The reference's full 13-field schema (query_matproj.py:38-51).  MPRester
# returns dotted sub-document keys as flat "a.b" columns; the CSV keeps them
# verbatim, and every downstream --target flag (voxelize, train_cgcnn)
# accepts dotted column names unchanged.
PROPERTIES = [
    "task_id",
    "pretty_formula",
    "formation_energy_per_atom",
    "cif",
    "band_gap",
    "diel.poly_electronic",
    "diel.refractive_index",
    "piezo.eij_max",
    "energy_per_atom",
    "elasticity.K_Voigt_Reuss_Hill",
    "elasticity.G_Voigt_Reuss_Hill",
    "elasticity.poisson_ratio",
    "nsites",
]


def build_criteria(anonymous_formula=None, system=None):
    """Safe parse of the query criteria.

    The reference ``eval``-ed the user's --anonymous_formula string
    (query_matproj.py:37, e.g. '{"A":1,"B":1,"C":3}'); here it is parsed as
    JSON.
    """
    import json

    criteria = {}
    if anonymous_formula:
        criteria["anonymous_formula"] = (
            json.loads(anonymous_formula)
            if anonymous_formula.strip().startswith("{")
            else anonymous_formula
        )
    if system:
        criteria["chemsys"] = system
    return criteria


def write_docs(docs, name, out="data") -> int:
    """Write MPRester-style docs to the reference layout: per-structure
    CIFs plus <name>.csv with every non-cif column (query_matproj.py:63-80).
    Dotted sub-document keys stay verbatim as CSV column names."""
    cif_dir = os.path.join(out, name, "cifs")
    os.makedirs(cif_dir, exist_ok=True)
    rows = []
    for doc in docs:
        task_id = doc["task_id"]
        if doc.get("cif"):
            with open(os.path.join(cif_dir, f"{task_id}.cif"), "w") as f:
                f.write(doc["cif"])
        rows.append({k: doc.get(k) for k in PROPERTIES if k != "cif"})
    with open(os.path.join(out, name, f"{name}.csv"), "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=[k for k in PROPERTIES if k != "cif"])
        writer.writeheader()
        writer.writerows(rows)
    print(f"wrote {len(rows)} structures -> {os.path.join(out, name)}")
    return 0


def run_query(
    api_key, name, anonymous_formula=None, system=None, out="data",
    from_json=None,
):
    if from_json:
        import json

        with open(from_json) as f:
            docs = json.load(f)
        return write_docs(docs, name, out)

    try:
        from pymatgen.ext.matproj import MPRester  # noqa: F401
    except ImportError:
        print(
            "pymatgen is not available in this environment; the Materials "
            "Project query path needs it.\n"
            "Offline alternatives:\n"
            "  python -m icsg3d_tpu.apps.query --from-json <mp_dump.json> ...\n"
            "  python -m icsg3d_tpu.apps.voxelize --cifs <dir> --out <dataset>\n"
            "  python -m icsg3d_tpu.apps.voxelize --synthetic 1000 --out <dataset>",
            file=sys.stderr,
        )
        return 1

    criteria = build_criteria(anonymous_formula, system)
    with MPRester(api_key) as mpr:
        docs = mpr.query(criteria=criteria, properties=PROPERTIES)
    return write_docs(docs, name, out)


def main(argv=None):
    p = argparse.ArgumentParser(description="Query the Materials Project")
    p.add_argument("--key", default=None, help="Materials Project API key")
    p.add_argument("--name", required=True)
    p.add_argument("--anonymous-formula", default=None, help="e.g. ABC3")
    p.add_argument("--system", default=None, help="e.g. Li-Fe-O")
    p.add_argument("--out", default="data")
    p.add_argument(
        "--from-json", default=None,
        help="offline mode: write CIFs+CSV from a saved MPRester JSON dump "
             "(the reference saved exactly this file, query_matproj.py:60-62) "
             "instead of querying the network",
    )
    args = p.parse_args(argv)
    if not args.key and not args.from_json:
        p.error("need --key (network query) or --from-json (offline dump)")
    sys.exit(
        run_query(
            args.key, args.name, args.anonymous_formula, args.system,
            args.out, from_json=args.from_json,
        )
    )


if __name__ == "__main__":
    main()
