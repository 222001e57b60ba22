#!/bin/bash
# Refresh BENCH_TRAIN.json at the shipped 64x256 recipe-default geometry.
# Three bench_train.py invocations (geometry sweep headlined at the default
# arm, amp/donate A/B matrix, DiffSinger MXU reference) merged into the same
# JSON layout prior rounds used.  Run from the repo root on a TPU-attached
# box; the persistent XLA cache makes repeats cheap.
set -e
cd "$(dirname "$0")/.."
python bench_train.py --geom-ab --out /tmp/bt_geom.json
python bench_train.py --ab --out /tmp/bt_ab.json
python bench_train.py --diffusion --out /tmp/bt_diff.json
python - <<'EOF'
import json

geom = json.load(open("/tmp/bt_geom.json"))
ab = json.load(open("/tmp/bt_ab.json"))
diff = json.load(open("/tmp/bt_diff.json"))

# Headline = the amp/donate A/B's amp_donate arm at the default geometry
# (mirrors prior rounds); attach the geometry sweep + diffusion reference.
out = dict(ab)
out["geometry_ab"] = geom["geometry_ab"]
out["diffsinger_ref"] = diff
with open("BENCH_TRAIN.json", "w") as f:
    json.dump(out, f)
print("BENCH_TRAIN.json refreshed:")
print(json.dumps({k: out[k] for k in ("metric", "value", "unit",
                                      "batch_pairs", "frames_per_batch",
                                      "use_amp", "mfu_vs_v5e_bf16_peak")},
                 indent=1))
EOF
