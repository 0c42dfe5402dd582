#!/bin/sh
# Custom-complex docking: one command replaces the reference's 3-script
# pipeline (preprocess mols -> preprocess proteins -> inference).
# index.csv columns: smiles, pdb (see FABind/inference_examples/example.csv)
python -m fabind_tpu.cli.inference --preset fabind --ckpt ckpt/best_model.bin \
    --index inference_examples/example.csv \
    --pdb-dir inference_examples/pdb_files --output out/ --post-optim
