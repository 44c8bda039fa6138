"""Custom backends: the user-controllable transforms pipeline.

Backends are objects carrying a ``Transforms`` workflow (the reference's
``next/backend.py`` Transforms MultiWorkflow). Any step can be replaced;
``with_rewrites`` injects function->function rewrites (remat, logging,
custom sharding wrappers) before jit; the ``jax:aot`` backend exposes the
explicit trace -> lower (StableHLO) -> compile chain with typed stage
artifacts.

Run: python examples/custom_backend.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import gt4py_tpu.next as gtx
from gt4py_tpu.next import Dimension

I = Dimension("I")


@gtx.field_operator
def smooth(phi, alpha):
    return phi * (1.0 - alpha) + alpha * phi


def main() -> None:
    n = 32
    phi = gtx.as_field([I], np.random.default_rng(1).random(n))
    out = gtx.zeros({I: n})

    # 1. Rematerialization backend: wrap the traced program in
    #    jax.checkpoint before compilation (memory/FLOPs tradeoff).
    import jax

    base = gtx.resolve_backend("jax")
    remat = base.replace(
        name="jax:remat", transforms=base.transforms.with_rewrites(jax.checkpoint)
    )
    smooth.with_backend(remat)(phi, alpha=0.3, out=out)
    print("remat backend out[:3] =", out.asnumpy()[:3])

    # 2. The explicit AOT chain, with every intermediate artifact:
    aot = gtx.resolve_backend("jax:aot")
    job = aot.compile_job(lambda a: a * 2.0 + 1.0, phi.ndarray)
    print("jaxpr:", job.traced_stage.text.strip().splitlines()[0], "...")
    print("stablehlo bytes:", len(job.lowered_stage.text))
    cost = job.compiled_stage.cost_analysis() or {}
    print("XLA flops estimate:", cost.get("flops"))

    # 3. A fully custom compile step (here: no jit at all — eager debug).
    def eager_compile(job):
        job.executable = job.fn
        return job

    eager = base.replace(
        name="jax:eager", transforms=base.transforms.replace(compile=eager_compile)
    )
    smooth.with_backend(eager)(phi, alpha=0.3, out=out)
    print("eager backend out[:3] =", out.asnumpy()[:3])


if __name__ == "__main__":
    main()
