"""Convert released reference torch `.pt` weights to an orbax checkpoint.

    python tools/convert_weights.py --model ReconVAT \
        --weights Weight/.../weight.pt --out converted/reconvat

The converted checkpoint loads via `evaluate.py with weight_file=<out>` or
`transcribe_files.py with weight_path=<out>`.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help="registry name, e.g. ReconVAT / UNet_Onset / "
                         "OnsetsAndFrames / Thickstun / Segmentation")
    ap.add_argument("--weights", required=True, help="torch .pt state_dict")
    ap.add_argument("--out", required=True, help="output checkpoint dir")
    ap.add_argument("--reconstruction", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from reconvat_tpu.models import get_model

    model = get_model(args.model)
    variables = model.init(jax.random.PRNGKey(0))
    converted = model.load_reference_weights(args.weights, variables)

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.out), converted, force=True)
    ckptr.wait_until_finished()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
