"""In-process CLI invocation for tests.

Each ``subprocess.run([sys.executable, -m, colddiff.cli.main, ...])`` costs
~15-60 s on this 1-core host (interpreter + jax import + cold XLA jit per
process).  Calling ``main(argv)`` in-process shares the pytest process's jax
runtime and jit caches, collapsing the CLI matrix from minutes per case to
seconds.  The real ``python -m`` entry point keeps exactly one subprocess
canary (tests/test_eval.py) and the 2-process cluster test
(tests/test_multihost.py) stays a true subprocess by necessity.
"""

from colddiff.cli.main import main as _cli_main


def run_cli(argv):
    """Run the colddiff CLI in-process; raises on failure like the binary."""
    _cli_main([str(a) for a in argv])
