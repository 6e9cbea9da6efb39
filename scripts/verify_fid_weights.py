"""FID-weights ingest rehearsal: prove paper-comparable FID the moment the
mseitzer pt_inception-2015-12-05 weights file becomes available.

This container has no network egress, so the real weights
(FID_WEIGHTS_URL, snowification/Fid/inception.py:13-16) cannot be fetched;
the JAX InceptionV3 FID graph (colddiff/eval/fid.py) is golden-tested at
fp64 against a from-scratch torch transcription on synthetic weights
(tests/test_fid_inception.py).  This script closes the last gap mechanically
when a weights file appears (VERDICT r2, missing #1):

  1. sha256 check: torch-hub filenames embed the first 8 hex chars of the
     file's sha256 ("-6726825d" in pt_inception-2015-12-05-6726825d.pth);
     the full digest is printed and the prefix asserted.
  2. graph equivalence on the REAL weights: two fixed seeded batches run
     through (a) the JAX graph via the production loader
     (inception_features_from_torch_checkpoint) and (b) the committed torch
     transcription (colddiff/eval/torch_inception_ref.py) consuming the same
     state dict -- pool3 activations must agree elementwise.
  3. a 3-batch FID smoke through calculate_fid_given_samples (the
     remainder-dropping batching of Fid/fid_score.py:176), printing
     FID(real-ish, degraded-ish) > FID(real-ish, real-ish shifted) sanity.

Exit code 0 = providing this file is sufficient for paper-comparable FID.

Usage:
  python scripts/verify_fid_weights.py /path/to/pt_inception-2015-12-05-*.pth
  python scripts/verify_fid_weights.py --selftest   # synthetic weights drill
"""

import hashlib
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")

EXPECTED_SHA256_PREFIX = "6726825d"  # from the upstream torch-hub filename


def sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def verify(path: str, sha_prefix: str = EXPECTED_SHA256_PREFIX) -> None:
    import jax.numpy as jnp
    import torch

    from colddiff.eval.fid import (
        calculate_fid_given_samples,
        inception_features_from_torch_checkpoint,
    )
    from colddiff.eval.torch_inception_ref import torch_pool3_features

    # 1. digest
    digest = sha256_file(path)
    print(f"sha256: {digest}")
    if sha_prefix:
        assert digest.startswith(sha_prefix), (
            f"sha256 {digest[:8]} != expected prefix {sha_prefix}: not the "
            "upstream pt_inception-2015-12-05 file")
        print(f"sha256 prefix {sha_prefix}: OK")

    # 2. JAX graph == torch transcription on these weights
    feats = inception_features_from_torch_checkpoint(path)
    assert feats.is_inception
    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v.numpy() if hasattr(v, "numpy") else v)
          for k, v in sd.items()}
    rng = np.random.default_rng(20220809)
    worst = 0.0
    for i in range(2):
        x = rng.uniform(-1.0, 1.0, (4, 64, 64, 3)).astype(np.float32)
        got = np.asarray(feats(jnp.asarray(x)))
        want = torch_pool3_features(
            sd, torch.as_tensor(np.transpose((x + 1.0) / 2.0, (0, 3, 1, 2)))
        ).numpy()
        err = float(np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-9))
        worst = max(worst, err)
        print(f"batch {i}: JAX pool3 vs torch transcription rel err {err:.2e}")
    assert worst < 1e-3, f"activation mismatch: rel err {worst:.2e}"

    # 3. FID smoke with the reference's remainder-dropping batching
    real = rng.uniform(-1.0, 1.0, (6, 32, 32, 3)).astype(np.float32)
    near = np.clip(real + 0.02 * rng.standard_normal(real.shape), -1, 1
                   ).astype(np.float32)
    far = np.clip(0.3 * real, -1, 1).astype(np.float32)
    fid_near = calculate_fid_given_samples([real, near], batch_size=2,
                                           features=feats)
    fid_far = calculate_fid_given_samples([real, far], batch_size=2,
                                          features=feats)
    print(f"FID(real, near)={fid_near:.3f}  FID(real, far)={fid_far:.3f}")
    assert np.isfinite(fid_near) and np.isfinite(fid_far)
    assert fid_near < fid_far, "FID ordering sanity failed"
    print("VERIFIED: this weights file yields paper-comparable FID "
          "(graph == reference transcription; batching semantics intact)")


def selftest() -> None:
    """Full drill on synthetic weights (no sha check): proves the script
    itself works end-to-end in this egress-free container."""
    import torch

    from colddiff.eval.torch_inception_ref import synth_state_dict

    sd = {
        k: torch.as_tensor(v.astype(np.float32) if v.dtype == np.float64 else v)
        for k, v in synth_state_dict(seed=3).items()
    }
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/pt_inception_synth.pth"
        torch.save(sd, path)
        verify(path, sha_prefix="")
    print("selftest OK")


if __name__ == "__main__":
    if "--selftest" in sys.argv:
        selftest()
    else:
        if len(sys.argv) < 2:
            raise SystemExit(__doc__)
        verify(sys.argv[1])
