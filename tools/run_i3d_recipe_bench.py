"""Measure ONLY the I3D reference-recipe configs (clip 64 x batch 3,
reference code/dmcnet_I3D/train.sh) and merge them into the existing
`i3d_train_step` section of bench_extended.json.

bench_i3d.measure_both() re-measures every config (hours of fresh I3D
compiles through the remote helper); the recipe rows are additive keys,
so this driver keeps the rest of the section as recorded.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import bench_i3d
    from bench import update_extended

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "bench_extended.json")
    with open(path) as f:
        section = json.load(f).get("i3d_train_step", {})
    # argv key substrings select which configs to (re-)measure — each is
    # a 10-25 min remote I3D compile, so re-measuring one key must not
    # re-run (or overwrite) the rest
    recipe = bench_i3d.measure_reference_recipe(keys=sys.argv[1:] or None)
    section.update(recipe)
    update_extended("i3d_train_step", section, path=path)
    print(json.dumps(recipe))


if __name__ == "__main__":
    main()
