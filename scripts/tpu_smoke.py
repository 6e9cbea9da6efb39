"""All-operator TPU smoke: train one step + sample through the real CLI.

The pytest matrix (tests/test_cli_matrix.py) runs the same thing on the
virtual CPU mesh; this runs it on the actual chip, where dtype promotion,
matmul precision, and the Pallas front differ.  Each operator gets a fresh
subprocess (own compile cache entry): 2 train steps at 16px T=3 with a
sample+checkpoint event, so degrade, loss, backward, EMA, the fused
sampler, and PNG/GIF dumps all execute on TPU.

Run: python scripts/tpu_smoke.py            (~3-15 min/operator: remote compiles dominate)
"""

import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

CASES = {
    "fade": ["--fade_routine", "Random_Incremental", "--kernel_std", "0.2",
             "--initial_mask", "2"],
    "blur": ["--blur_size", "3", "--blur_std", "1.0", "--blur_routine", "Constant"],
    "noise": [],
    "decolor": ["--decolor_routine", "Linear", "--decolor_total_remove"],
    "fade_naive": ["--fade_routine", "Spiral"],
    "fade_generation": ["--kernel_std", "0.2", "--initial_mask", "2"],
    "resolution": ["--resolution_routine", "Incremental_factor_2"],
    "snow": ["--snow_level", "2", "--random_snow"],
    "mix": [],  # --data_path_2 added below
}


def main():
    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        folder2 = tmp / "second"
        folder2.mkdir()
        import numpy as np
        from PIL import Image

        rng = np.random.default_rng(0)
        for i in range(10):
            arr = (rng.random((18, 18, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(folder2 / f"{i}.png")

        for op, extra in CASES.items():
            if op == "mix":
                extra = ["--data_path_2", str(folder2)]
            cmd = [
                sys.executable, "-m", "colddiff.cli.main", "train",
                "--degradation", op, "--dataset", "synthetic",
                "--image_size", "16", "--time_steps", "3",
                "--model", "UnetConvNext", "--dim", "8",
                "--batch_size", "8", "--train_steps", "2", "--grad_accum", "1",
                "--save_and_sample_every", "2",
                "--save_folder", str(tmp / f"out_{op}"),
                *extra,
            ]
            t0 = time.time()
            r = subprocess.run(cmd, capture_output=True, text=True,
                               cwd=os.path.dirname(os.path.dirname(
                                   os.path.abspath(__file__))),
                               timeout=2400)
            dumped = sorted(
                p.name for p in (tmp / f"out_{op}").glob("*.png"))
            ok = r.returncode == 0 and any(
                n.startswith("sample-") for n in dumped)
            results[op] = "PASS" if ok else "FAIL"
            print(f"{op:16s} {results[op]}  ({time.time()-t0:5.1f}s, "
                  f"artifacts: {dumped[:4]})", flush=True)
            if not ok:
                print(r.stderr[-1500:], flush=True)
    bad = [k for k, v in results.items() if v != "PASS"]
    print(f"{len(results) - len(bad)}/{len(results)} operators PASS on TPU",
          flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
