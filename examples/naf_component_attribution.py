"""NAFNet component attribution (TPU): stub one component class at a time.

Same method as examples/forward_attribution.py, applied to EnhancedNAFNet
(b8 512^2 bf16): LayerNorm was already measured (~35%); this locates the
rest — depthwise 3x3, SimpleGate+SCA, pixel-shuffle ups — to see whether
anything else lowers as badly as the pre-round-3 GroupNorm did.
Timing only; semantics deliberately broken in the stubs.
"""
import json, sys, time
import numpy as np

N_SCAN, N_TIMED = 20, 3

def log(*a): print(*a, file=sys.stderr, flush=True)

def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax, jax.numpy as jnp
    from flax import linen as nn
    from midd_tpu import config
    from midd_tpu.models import blocks as B
    from midd_tpu.models import nafnet as N
    from midd_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    dev = jax.devices()[0]
    on_tpu = dev.platform in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else None
    log(f"device: {dev}")

    real_conv = nn.Conv

    class NoDWConv(nn.Conv):
        """3x3 depthwise (feature_group_count==features) -> identity-ish."""
        @nn.compact
        def __call__(self, x):
            if self.feature_group_count > 1:
                return x
            return real_conv.__call__(self, x)

    saved_block = B.NAFBlock

    def patched(which):
        if which == "no_dw":
            class P(B.NAFBlock):
                @nn.compact
                def __call__(self, inp):
                    c = inp.shape[-1]
                    dw = c * self.dw_expand
                    dt = self.dtype
                    x = B.LayerNorm2d(name="norm1")(inp)
                    x = B.tconv(dw, 1, name="conv1", dtype=dt)(x)
                    # depthwise conv REMOVED
                    x = B.simple_gate(x)
                    from midd_tpu.ops.image import global_avg_pool
                    sca = B.tconv(dw // 2, 1, name="sca_1", dtype=dt)(global_avg_pool(x))
                    x = x * sca
                    x = B.tconv(c, 1, name="conv3", dtype=dt)(x)
                    beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, c))
                    y = inp + x * beta.astype(x.dtype)
                    x = B.LayerNorm2d(name="norm2")(y)
                    x = B.tconv(self.ffn_expand * c, 1, name="conv4", dtype=dt)(x)
                    x = B.simple_gate(x)
                    x = B.tconv(c, 1, name="conv5", dtype=dt)(x)
                    gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, c))
                    return y + x * gamma.astype(x.dtype)
            return P
        if which == "no_sca":
            class P(B.NAFBlock):
                @nn.compact
                def __call__(self, inp):
                    c = inp.shape[-1]
                    dw = c * self.dw_expand
                    dt = self.dtype
                    x = B.LayerNorm2d(name="norm1")(inp)
                    x = B.tconv(dw, 1, name="conv1", dtype=dt)(x)
                    x = nn.Conv(dw, (3, 3), padding=((1, 1), (1, 1)),
                                feature_group_count=dw, name="conv2", dtype=dt)(x)
                    x = B.simple_gate(x)
                    # SCA REMOVED
                    x = B.tconv(c, 1, name="conv3", dtype=dt)(x)
                    beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, c))
                    y = inp + x * beta.astype(x.dtype)
                    x = B.LayerNorm2d(name="norm2")(y)
                    x = B.tconv(self.ffn_expand * c, 1, name="conv4", dtype=dt)(x)
                    x = B.simple_gate(x)
                    x = B.tconv(c, 1, name="conv5", dtype=dt)(x)
                    gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, c))
                    return y + x * gamma.astype(x.dtype)
            return P
        return saved_block

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((args.batch, args.size, args.size, 1)).astype(np.float32))
    if dtype is not None:
        x0 = x0.astype(dtype)
    results = {}
    for name in ("base", "no_dw", "no_sca"):
        B.NAFBlock = patched(name)
        N.NAFBlock = B.NAFBlock
        try:
            model = N.EnhancedNAFNet(config.SERVE_NAFNET, dtype=dtype)
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0[:1].astype(jnp.float32))
            def scan_fwd(v, z):
                def step(c, _):
                    return model.apply(v, c).astype(z.dtype), None
                return jax.lax.scan(step, z, None, length=N_SCAN)[0]
            f = jax.jit(scan_fwd)
            t = time.time(); float(jnp.sum(f(variables, x0).astype(jnp.float32)))
            log(f"{name}: compile {time.time()-t:.1f}s")
            xs = [(x0 + jnp.asarray(i * 1e-3, x0.dtype)).astype(x0.dtype) for i in range(1, N_TIMED + 1)]
            t = time.time()
            _ = sum(float(jnp.sum(f(variables, z).astype(jnp.float32))) for z in xs)
            ms = (time.time() - t) / (N_TIMED * N_SCAN) * 1e3
        finally:
            B.NAFBlock = saved_block
            N.NAFBlock = saved_block
        results[name] = round(ms, 3)
        log(f"{name}: {ms:8.3f} ms/fwd")
    print(json.dumps({"device": str(dev), "ms_per_forward": results}))

if __name__ == "__main__":
    main()
