import sys
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from jax import lax
import gt4py_tpu.cartesian.backend.pallas_codegen as pc
from gt4py_tpu.cartesian import gtscript
from tests.cartesian_tests import stencil_defs as defs
import bench as B

timer = B.StepTimer()
rng = np.random.default_rng(0)
ni, nj, nk = 256, 256, 80
budget = int(sys.argv[1]) << 20
pc._VMEM_BUDGET = budget
st2 = gtscript.stencil(backend="jax", definition=defs.vertical_advection_dycore_generic,
    externals=defs.VADV_EXTERNALS, dtypes={"vadv_dt": np.float32},
    literal_float_precision=32, literal_int_precision=32, name=f"vadv_b{budget}")
vshape = (ni, nj, nk); vdomain = (ni-1, nj, nk)
vorigins = {n: (0,0,0) for n in ("utens_stage","u_stage","wcon","u_pos","utens")}
plan2 = pc._Plan(st2._analyzed, vdomain, vorigins)
print(f"budget={budget>>20}MB tiles:", plan2.ti, plan2.tj, plan2.tk, "grid", plan2.grid)
pfn2 = pc._build_tiled_fn(st2._analyzed, vdomain, vorigins)
def make2(n):
    @jax.jit
    def f(utens_stage, u_stage, wcon, u_pos, utens):
        def body(i, us):
            return pfn2({"utens_stage": us, "u_stage": u_stage, "wcon": wcon,
                         "u_pos": u_pos, "utens": utens},
                        {"dtr_stage": np.float32(0.15)})["utens_stage"]
        return lax.fori_loop(0, n, body, utens_stage)
    return f
try:
    t2 = timer.measure(make2, lambda: tuple(
        jnp.asarray(rng.random(vshape, dtype=np.float32)) for _ in range(5)), n_lo=2, n_hi=52)
    vpoints = (ni-1)*nj*nk
    print(f"vadv tiled: {t2*1e6:.1f} us/step, roofline {6*vpoints*4/t2/819e9:.3f}")
except Exception as e:
    print("FAIL:", "REMOTE500" if "HTTP 500" in str(e) else str(e)[:120])
