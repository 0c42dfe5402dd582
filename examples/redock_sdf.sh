#!/bin/sh
# SDF redocking without RDKit: ligand conformers come from existing SDF
# files (the reference's gt_mol_files layout), parsed by the pure-Python
# V2000 reader; docked poses are written back as SDF by the pure writer.
# Works on hosts with no RDKit installed.
python -m fabind_tpu.cli.inference --preset fabind --ckpt ckpt/best_model.bin \
    --index inference_examples/example.csv \
    --pdb-dir inference_examples/pdb_files \
    --ligand-sdf-dir inference_examples/gt_mol_files --output out/

# Or over HTTP (inline molfile text; response carries the docked pose as
# molfile text in the "sdf" field):
#   python -m fabind_tpu.cli.serve --preset fabind --ckpt ckpt/best_model.bin \
#       --port 8400 --pdb-root inference_examples/pdb_files &
#   curl -s localhost:8400/dock_sdf -d \
#       "[{\"sdf\": \"$(awk 1 ORS='\\n' lig.sdf)\", \"pdb\": \"6npi.pdb\"}]"
