"""TPU-hardware test configuration.

Unlike tests/ (which forces JAX_PLATFORMS=cpu), this suite runs on
whatever backend the environment provides and SKIPS unless that backend
is a real accelerator.  Run it from the bench environment:

    python -m pytest tests_tpu/ -q

Keep it serialized with other TPU work — the axon tunnel is
single-tenant (see .claude/skills/verify/SKILL.md gotchas).
"""

import pytest


@pytest.fixture(scope="session")
def tpu_backend():
    jax = pytest.importorskip("jax")
    backend = jax.default_backend()
    if backend in ("cpu",):
        pytest.skip("no accelerator backend (default_backend=cpu)")
    return backend
