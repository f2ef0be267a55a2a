"""Application layer: CLI entry points and their callable cores.

    python -m icsg3d_tpu.apps.voxelize    # CIFs/synthetic -> packed dataset
    python -m icsg3d_tpu.apps.train_unet
    python -m icsg3d_tpu.apps.train_vae
    python -m icsg3d_tpu.apps.train_cgcnn
    python -m icsg3d_tpu.apps.generate    # sample -> decode -> watershed -> CIF
    python -m icsg3d_tpu.apps.evaluate    # reconstruction EMD / atom-count
    python -m icsg3d_tpu.apps.interpolate # latent interpolation
    python -m icsg3d_tpu.apps.view        # per-sample pipeline inspection plots
    python -m icsg3d_tpu.apps.query       # Materials Project download (needs net)

Every CLI mirrors a reference script (generate.py, eval.py, interpolate.py,
view_results.py, query_matproj.py, create_matrices.py, train_*.py); the
cores are importable functions so the apps compose as a library too.
"""
