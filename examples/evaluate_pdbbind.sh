#!/bin/sh
# Released-checkpoint evaluation on the PDBbind-2020 timesplit test set.
# DATA is the reference's preprocessed directory (LMDB stores); the released
# .bin checkpoints are converted on the fly.
DATA=${DATA:-/path/to/pdbbind}

# FABind base protocol (test_fabind.py): full test split + unseen subset
python -m fabind_tpu.cli.evaluate --preset fabind --data "$DATA" \
    --ckpt ckpt/best_model.bin --buckets auto --split test
python -m fabind_tpu.cli.evaluate --preset fabind --data "$DATA" \
    --ckpt ckpt/best_model.bin --buckets auto --split test \
    --unseen-index split_pdb_id/unseen_test_index

# FABind+ regression protocol (test_regression_fabind.py): symmetric RMSD,
# per-pdb RMSD dump, predicted-pose SDFs
python -m fabind_tpu.cli.evaluate --preset fabind_plus --data "$DATA" \
    --ckpt ckpt/fabind_plus_best_ckpt.bin --buckets auto --split test \
    --symmetric-rmsd --save-rmsd rmsd.txt --write-coords-dir poses/

# FABind+ sampling benchmark (test_sampling_fabind.py): best-of-40 with the
# symmetric-RMSD protocol and the per-epoch confidence dumps the reference
# aggregation consumes
python -m fabind_tpu.cli.sample --data "$DATA" \
    --ckpt ckpt/fabind_plus_best_ckpt.bin --sample-size 40 \
    --symmetric-rmsd --save-rmsd-dir sampling_dumps/

# Legacy TankBind-style distance-map docking (generation_utils.py:42-120):
# discard the coordinate head's pose and optimize coords against the
# predicted distance map + LAS constraints, best of 3 random restarts
python -m fabind_tpu.cli.evaluate --preset fabind --data "$DATA" \
    --ckpt ckpt/best_model.bin --split test \
    --distmap-dock --distmap-repeats 3
