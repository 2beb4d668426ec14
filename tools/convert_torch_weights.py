#!/usr/bin/env python
"""One-time conversion of pretrained torch weights to .npz for the Flax
feature nets (run in any environment with torchvision + lpips installed;
this hermetic TPU image has neither, so the nets fall back to fixed-seed
inits until these files are provisioned).

Produces, under --out (default ./weights):
  vgg19_features.npz    conv_{i}/kernel HWIO + conv_{i}/bias for the 16
                        convs of torchvision vgg19(weights='DEFAULT')
                        .features[:35] (reference src/loss.py:23)
  alexnet_features.npz  the 5 convs of torchvision alexnet features
  lpips_alex_heads.npz  lin_{i}: non-negative 1x1 head weights [C_i] from
                        lpips.LPIPS(net='alex') (reference src/metrics.py:11)

Also converts reference .pth checkpoints to Flax param npz with
--checkpoint (see convert_sr_checkpoint below).
"""
import argparse
import hashlib
import json
import os
import sys

import numpy as np

MANIFEST = "MANIFEST.json"            # committed contract: names + shapes
GENERATED = "MANIFEST.generated.json"  # written at conversion: content hashes

# Upstream provenance (public, stable): torchvision embeds the sha256
# prefix in the weight filename; lpips ships its heads inside the pip pkg.
SOURCES = {
    "vgg19_features.npz": {
        "upstream": "torchvision vgg19(weights='DEFAULT') == IMAGENET1K_V1",
        "url": "https://download.pytorch.org/models/vgg19-dcbb9e9d.pth",
        "upstream_sha256_prefix": "dcbb9e9d",
        "reference": "src/loss.py:23 (features[:35] for PerceptualLoss)",
    },
    "alexnet_features.npz": {
        "upstream": "torchvision alexnet(weights='DEFAULT') == IMAGENET1K_V1",
        "url": "https://download.pytorch.org/models/alexnet-owt-7be5be79.pth",
        "upstream_sha256_prefix": "7be5be79",
        "reference": "src/metrics.py:11 (LPIPS AlexNet backbone)",
    },
    "lpips_alex_heads.npz": {
        "upstream": "lpips==0.1.4 pip package, lpips/weights/v0.1/alex.pth",
        "url": "https://pypi.org/project/lpips/0.1.4/",
        "upstream_sha256_prefix": None,
        "reference": "src/metrics.py:11 (LPIPS linear heads)",
    },
}


def expected_specs() -> dict:
    """The exact array names + shapes each npz must contain, derived from
    the Flax modules themselves (jax.eval_shape — no torch, no weights).
    This is the committed contract the converter's output is checked
    against, on both the generating machine and the TPU host."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import food101_sr_tpu

    food101_sr_tpu.use_cpu_backend()  # axon ignores JAX_PLATFORMS
    from food101_sr_tpu.models.feature_nets import (
        LPIPS_TAP_CHANNELS, AlexNetFeatures, VGG19Features)

    specs = {}
    for name, module, shape in (
        ("vgg19_features.npz", VGG19Features(), (1, 32, 32, 3)),
        ("alexnet_features.npz", AlexNetFeatures(), (1, 64, 64, 3)),
    ):
        tree = jax.eval_shape(
            lambda m=module, s=shape: m.init(
                jax.random.PRNGKey(0), jnp.zeros(s, jnp.float32)))["params"]
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        specs[name] = {
            "arrays": {"/".join(str(k.key) for k in p): list(v.shape)
                       for p, v in sorted(flat, key=str)},
            **SOURCES[name],
        }
    specs["lpips_alex_heads.npz"] = {
        "arrays": {f"lin_{i}": [c] for i, c in enumerate(LPIPS_TAP_CHANNELS)},
        **SOURCES["lpips_alex_heads.npz"],
    }
    return specs


def content_sha256(path: str) -> str:
    """Canonical content hash of an npz: sha256 over (key, dtype, shape,
    raw bytes) for every array in sorted key order. np.savez zip bytes are
    NOT deterministic (timestamps), so the hash must be over the arrays."""
    h = hashlib.sha256()
    with np.load(path) as npz:
        for key in sorted(npz.files):
            arr = np.ascontiguousarray(npz[key])
            h.update(key.encode())
            h.update(str(arr.dtype).encode())
            h.update(str(arr.shape).encode())
            h.update(arr.tobytes())
    return h.hexdigest()


def check_against_manifest(weights_dir: str, name: str) -> list[str]:
    """Shape/name mismatches vs the committed MANIFEST.json + content-hash
    mismatch vs MANIFEST.generated.json (when present). Empty list = OK."""
    problems = []
    path = os.path.join(weights_dir, name)
    man_path = os.path.join(weights_dir, MANIFEST)
    if os.path.exists(man_path):
        with open(man_path) as f:
            want = json.load(f)["files"].get(name, {}).get("arrays", {})
        with np.load(path) as npz:
            got = {k: list(npz[k].shape) for k in npz.files}
        if want and got != want:
            missing = sorted(set(want) - set(got))
            extra = sorted(set(got) - set(want))
            bad = {k: (got[k], want[k]) for k in want
                   if k in got and got[k] != want[k]}
            problems.append(f"manifest mismatch: missing={missing} "
                            f"unexpected={extra} shapes(got,want)={bad}")
    gen_path = os.path.join(weights_dir, GENERATED)
    if os.path.exists(gen_path):
        with open(gen_path) as f:
            want_hash = json.load(f)["files"].get(name, {}).get(
                "content_sha256")
        if want_hash:
            got_hash = content_sha256(path)
            if got_hash != want_hash:
                problems.append(
                    f"content hash {got_hash[:16]}… != recorded "
                    f"{want_hash[:16]}… (corrupted in transit? re-copy "
                    f"both the npz and {GENERATED})")
    return problems


def write_manifest(out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, MANIFEST)
    with open(path, "w") as f:
        json.dump({
            "_comment": (
                "Contract for the pretrained feature-net weight files "
                "(names, shapes, upstream provenance). Produce + verify "
                "them in any internet-connected environment with "
                "torchvision+lpips installed:  python "
                "tools/convert_torch_weights.py --out weights   then copy "
                "weights/*.npz AND weights/MANIFEST.generated.json to "
                "this repo's weights/ dir and run:  python "
                "tools/convert_torch_weights.py --verify"),
            "files": expected_specs(),
        }, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path}")


def features_to_arrays(net) -> dict:
    """Flat ``conv_{i}/kernel`` (HWIO) + ``conv_{i}/bias`` arrays from any
    torch Sequential of Conv2d/ReLU/MaxPool layers — the single conversion
    path shared by both feature nets, and unit-tested against randomly
    initialized plain-torch stacks (tests/test_feature_nets_torch.py), so
    the OIHW->HWIO transpose is proven before real weights ever flow
    through it."""
    arrays = {}
    conv_idx = 0
    for layer in net:
        if layer.__class__.__name__ == "Conv2d":
            w = layer.weight.detach().numpy()  # OIHW
            arrays[f"conv_{conv_idx}/kernel"] = w.transpose(2, 3, 1, 0)  # HWIO
            arrays[f"conv_{conv_idx}/bias"] = layer.bias.detach().numpy()
            conv_idx += 1
    return arrays


def lpips_heads_to_arrays(lins) -> dict:
    """``lin_{i}: [C_i]`` head weights from lpips.LPIPS(net='alex').lins
    (each a NetLinLayer whose last module is a 1x1 Conv2d [1,C,1,1])."""
    return {f"lin_{i}": lin.model[-1].weight.detach().numpy().reshape(-1)
            for i, lin in enumerate(lins)}


def convert_vgg19(out_dir):
    from torchvision.models import vgg19

    net = vgg19(weights="DEFAULT").features[:35].eval()
    arrays = features_to_arrays(net)
    np.savez(os.path.join(out_dir, "vgg19_features.npz"), **arrays)
    print(f"vgg19: {sum(1 for k in arrays if k.endswith('kernel'))} convs")


def convert_alexnet(out_dir):
    from torchvision.models import alexnet

    net = alexnet(weights="DEFAULT").features.eval()
    arrays = features_to_arrays(net)
    np.savez(os.path.join(out_dir, "alexnet_features.npz"), **arrays)
    print(f"alexnet: {sum(1 for k in arrays if k.endswith('kernel'))} convs")


def convert_lpips_heads(out_dir):
    import lpips

    net = lpips.LPIPS(net="alex", verbose=False)
    arrays = lpips_heads_to_arrays(net.lins)
    np.savez(os.path.join(out_dir, "lpips_alex_heads.npz"), **arrays)
    print(f"lpips heads: {len(arrays)}")


def verify(weights_dir):
    """Validate provisioned npz files against the Flax nets WITHOUT torch:
    the loaders now shape-check on load (models/feature_nets.py), so simply
    loading each file through the production path proves structure, names,
    and shapes. Run this on the TPU host after copying the files over."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import food101_sr_tpu

    # shape validation needs no accelerator; keep it off the TPU tunnel
    # (the axon plugin ignores JAX_PLATFORMS — the config route works)
    food101_sr_tpu.use_cpu_backend()
    from food101_sr_tpu.models.feature_nets import (
        AlexNetFeatures, VGG19Features, load_feature_params, load_lpips_heads)

    ok = True
    for name, module, shape in (
        ("vgg19_features.npz", VGG19Features(), (1, 32, 32, 3)),
        ("alexnet_features.npz", AlexNetFeatures(), (1, 64, 64, 3)),
    ):
        if not os.path.exists(os.path.join(weights_dir, name)):
            print(f"{name}: ABSENT (loaders will use the seeded fallback)")
            ok = False
            continue
        try:
            _, pretrained = load_feature_params(module, name, shape,
                                                weights_dir)
            problems = check_against_manifest(weights_dir, name)
            for pr in problems:
                print(f"{name}: {pr}")
            ok &= not problems
            if not problems:
                print(f"{name}: OK (pretrained={pretrained}, manifest+hash "
                      f"checked)")
        except Exception as e:  # corrupt zip, missing keys, bad shapes...
            print(f"{name}: INVALID — {type(e).__name__}: {e}")
            ok = False
    if os.path.exists(os.path.join(weights_dir, "lpips_alex_heads.npz")):
        try:
            _, pretrained = load_lpips_heads(weights_dir)
            problems = check_against_manifest(weights_dir,
                                              "lpips_alex_heads.npz")
            for pr in problems:
                print(f"lpips_alex_heads.npz: {pr}")
            ok &= not problems
            if not problems:
                print(f"lpips_alex_heads.npz: OK (pretrained={pretrained}, "
                      f"manifest+hash checked)")
        except Exception as e:
            print(f"lpips_alex_heads.npz: INVALID — {type(e).__name__}: {e}")
            ok = False
    else:
        print("lpips_alex_heads.npz: ABSENT (uniform-head fallback)")
        ok = False
    return ok


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="weights")
    p.add_argument("--verify", action="store_true",
                   help="validate already-provisioned npz files in --out "
                        "against the Flax nets + the committed "
                        "MANIFEST.json shapes + the recorded content "
                        "hashes (no torch needed; run on the TPU host "
                        "after copying the files)")
    p.add_argument("--write_manifest", action="store_true",
                   help="(maintainer) regenerate the committed "
                        "MANIFEST.json contract from the Flax modules")
    args = p.parse_args()
    if args.write_manifest:
        write_manifest(args.out)
        raise SystemExit(0)
    if args.verify:
        raise SystemExit(0 if verify(args.out) else 1)
    # THE turnkey command (run with internet + torchvision + lpips):
    # convert all three, self-verify against the committed manifest, and
    # record content hashes for transit-integrity checking on the TPU host.
    os.makedirs(args.out, exist_ok=True)
    convert_vgg19(args.out)
    convert_alexnet(args.out)
    convert_lpips_heads(args.out)
    names = list(SOURCES)
    problems = {n: check_against_manifest(args.out, n) for n in names}
    for n, prs in problems.items():
        for pr in prs:
            print(f"{n}: {pr}")
    if any(problems.values()):
        raise SystemExit("conversion output does not match the committed "
                         "manifest — do not ship these files")
    gen = {n: {"content_sha256": content_sha256(os.path.join(args.out, n))}
           for n in names}
    with open(os.path.join(args.out, GENERATED), "w") as f:
        json.dump({"files": gen}, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"all files match {MANIFEST}; content hashes -> "
          f"{os.path.join(args.out, GENERATED)}")
    print(f"next: copy {args.out}/*.npz + {args.out}/{GENERATED} into this "
          f"repo's weights/ dir on the TPU host, then run:  python "
          f"tools/convert_torch_weights.py --verify")
