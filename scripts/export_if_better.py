"""Export release weights only if the run's best val beats a threshold.

After a checkpoint-seeded resume (seed_checkpoint_from_release.py) the
sidecar val history covers only the NEW epochs; blindly exporting "best"
could replace the committed release with a worse checkpoint (fresh
optimizer warm-up).  This gates scripts/export_release.py on the sidecar's
best val loss.

Usage: python scripts/export_if_better.py <experiment_dir> <val_threshold>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from acousticswarms_speech_tpu.training.checkpoints import (
        load_state_summary,
    )
    from export_release import export

    exp_dir, threshold = sys.argv[1].rstrip("/"), float(sys.argv[2])
    state_path = os.path.join(exp_dir, "checkpoints", "state.msgpack")
    summary = load_state_summary(state_path)
    # sidecar key is val_losses (checkpoints.save_state); older runs wrote
    # test_losses — accept either (the round-5 close silently skipped on
    # this mismatch)
    losses = ((summary or {}).get("val_losses")
              or (summary or {}).get("test_losses") or [])
    if not losses:
        print(f"[export_if_better] no val history in {state_path}; skipping")
        return
    best = min(losses)
    if best <= threshold:
        print(f"[export_if_better] best val {best:.6g} <= {threshold:g}; "
              f"exporting")
        export(exp_dir)
    else:
        print(f"[export_if_better] best val {best:.6g} > {threshold:g}; "
              f"keeping the committed release")


if __name__ == "__main__":
    main()
