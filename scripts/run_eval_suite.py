"""Final evaluation suite: bench + held-out-scene eval + analysis.

Runs (on the real TPU — make sure no training process holds the chip):
  1. `python bench.py`  -> one-line JSON throughput result
  2. `pipeline.evaluate` over a shard of the held-out test set
  3. `pipeline.analyze` -> precision/recall, localization error, SI-SDRi

Usage:
  python scripts/run_eval_suite.py [--dataset .speechdata_v1/test]
      [--num_shards 3] [--shard_index 0] [--results_folder .results_speech]
      [--skip_bench]
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default=".speechdata_v1/test")
    p.add_argument("--spot_exp", default="experiments/speech_localization")
    p.add_argument("--sep_exp", default="experiments/speech_separation")
    p.add_argument("--results_folder", default=".results_speech")
    p.add_argument("--num_shards", type=int, default=3)
    p.add_argument("--shard_index", type=int, default=0)
    p.add_argument("--skip_bench", action="store_true")
    args = p.parse_args()

    def spot_dir():
        d = os.path.join(REPO, args.spot_exp)
        if os.path.isdir(os.path.join(d, "checkpoints")) or \
                os.path.isdir(os.path.join(d, "release")):
            return d
        return os.path.join(REPO, "experiments/speech_localization_stage1")

    if not args.skip_bench:
        print("=== bench ===", flush=True)
        r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")])
        if r.returncode != 0:
            print("bench FAILED", file=sys.stderr)

    print("=== eval ===", flush=True)
    cmd = [
        sys.executable, "-m", "acousticswarms_speech_tpu.pipeline.evaluate",
        args.dataset,
        "--spot_experiment_dir", spot_dir(),
        "--sep_experiment_dir", os.path.join(REPO, args.sep_exp),
        "--results_folder", args.results_folder,
        "--use_fp16", "--cached_init",
        "--num_shards", str(args.num_shards),
        "--shard_index", str(args.shard_index),
    ]
    print(" ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=REPO)
    if r.returncode != 0:
        sys.exit(r.returncode)

    print("=== analyze ===", flush=True)
    r = subprocess.run(
        [sys.executable, "-m", "acousticswarms_speech_tpu.pipeline.analyze",
         args.results_folder], cwd=REPO)
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
