"""Build/refresh the mined-only fine-tune corpus dir (.speechdata_ft/train).

The hard-negative fine-tune (challenge_ratio 0.8, reference
experiments/localization/description.json:25) silently falls back to random
negatives on scenes without challeng_sample.json (datasets.py:270-278),
halving the effective hard-negative share on a partially mined corpus.
This symlinks ONLY the mined scenes of a source corpus into a separate
train dir so the effective ratio stays at 0.8 while mining continues in the
background; re-run it any time to pick up newly mined scenes (the trainer
re-lists the dir on every bounded-chunk restart).

Usage: python scripts/build_ft_dir.py [src=.speechdata_v1/train] [dst=.speechdata_ft/train]
"""
import os
import sys


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else ".speechdata_v1/train"
    dst = sys.argv[2] if len(sys.argv) > 2 else ".speechdata_ft/train"
    os.makedirs(dst, exist_ok=True)
    src_abs = os.path.abspath(src)
    added = total = 0
    for name in sorted(os.listdir(src)):
        d = os.path.join(src, name)
        if not (os.path.isdir(d) and name[:1].isdigit()):
            continue
        if not os.path.exists(os.path.join(d, "metadata.json")):
            continue
        if not os.path.exists(os.path.join(d, "challeng_sample.json")):
            continue
        total += 1
        link = os.path.join(dst, name)
        if not os.path.lexists(link):
            os.symlink(os.path.join(src_abs, name), link)
            added += 1
    print(f"[build_ft_dir] {dst}: {total} mined scenes ({added} new links)")


if __name__ == "__main__":
    main()
