"""Strip optimizer state from checkpoints
(reference: src/tools/remove_optimizers.py).

Usage:
  python -m centertrack_tpu.tools.slim_checkpoint in.ckpt out.ckpt
"""

import pickle
import sys


def main():
    src, dst = sys.argv[1], sys.argv[2]
    with open(src, "rb") as f:
        payload = pickle.load(f)
    payload.pop("opt_state", None)
    with open(dst, "wb") as f:
        pickle.dump(payload, f)
    print(f"{src} -> {dst} (optimizer state removed)")


if __name__ == "__main__":
    main()
