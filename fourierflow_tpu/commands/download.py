"""Dataset downloaders (FNO, Geo-FNO, meshgraphnets).

Equivalent of reference:fourierflow/commands/download.py, dependency-light:
plain-HTTP files come through urllib (stdlib); the Google-Drive-hosted FNO
and Geo-FNO archives need ``gdown``, which is imported lazily and reported
clearly when absent (the TPU image has no egress — run these from a
network-enabled machine and point DATA_ROOT at shared storage).
"""

import logging
import os
import shutil
import urllib.request
import zipfile
from pathlib import Path

logger = logging.getLogger(__name__)

__all__ = ["fno", "geo_fno", "meshgraphnets", "download_file"]

# Google Drive share ids for the Li et al. FNO datasets
# (reference download.py:40-50).
FNO_DATASETS = {
    "16a8od4vidbiNR3WtaBPCSZ0T3moxjhYe": "Burgers_R10.zip",
    "1nzT0-Tu-LS2SoMUCcmO1qyjQd6WC9OdJ": "Burgers_v100.zip",
    "1G9IW_2shmfgprPYISYt_YS8xa87p4atu": "Burgers_v1000.zip",
    "1ViDqN7nc_VCnMackiXv_d7CHZANAFKzV": "Darcy_241.zip",
    "1Z1uxG9R8AdAGJprG5STcphysjm56_0Jf": "Darcy_421.zip",
    "1r3idxpsHa21ijhlu3QQ1hVuXcqnBTO7d": "NavierStokes_V1e-3_N5000_T50.zip",
    "1pr_Up54tNADCGhF8WLvmyTfKlCD5eEkI": "NavierStokes_V1e-4_N20_T50_R256_test.zip",
    "1RmDQQ-lNdAceLXrTGY_5ErvtINIXnpl3": "NavierStokes_V1e-4_N10000_T30.zip",
    "1lVgpWMjv9Z6LEv3eZQ_Qgj54lYeqnGl5": "NavierStokes_V1e-5_N1200_T20.zip",
}

GEO_FNO_FOLDER = "https://drive.google.com/drive/folders/1YBuaoTdOSr_qzaow-G-iwvbUI7fiUzu8"

MGN_SETTINGS = [
    "airfoil", "cylinder_flow", "deforming_plate", "flag_minimal",
    "flag_simple", "flag_dynamic", "flag_dynamic_sizing",
    "sphere_simple", "sphere_dynamic", "sphere_dynamic_sizing",
]
MGN_FILES = ["meta.json", "train.tfrecord", "valid.tfrecord", "test.tfrecord"]
MGN_BASE_URL = "https://storage.googleapis.com/dm-meshgraphnets"


def download_file(url: str, out_path):
    """Stream a URL to disk (download.py:14-18)."""
    with urllib.request.urlopen(url) as r, open(out_path, "wb") as f:
        shutil.copyfileobj(r, f)


def _require_gdown():
    try:
        import gdown
        return gdown
    except ImportError as e:
        raise SystemExit(
            "The FNO/Geo-FNO datasets live on Google Drive and need the "
            "'gdown' package; install it on a network-enabled machine "
            "(pip install gdown) and re-run, then copy the data over."
        ) from e


def fno(data_root: str = "$DATA_ROOT"):
    """Download the Li et al. FNO datasets into $DATA_ROOT/zongyi
    (download.py:21-64)."""
    gdown = _require_gdown()
    workdir = Path(os.path.expandvars(data_root)) / "zongyi"
    workdir.mkdir(parents=True, exist_ok=True)
    for share_id, fname in FNO_DATASETS.items():
        out = workdir / fname
        logger.info("Downloading %s", fname)
        gdown.download(f"https://drive.google.com/uc?id={share_id}", str(out))
        with zipfile.ZipFile(out) as zf:
            zf.extractall(workdir)
        out.unlink()


def geo_fno(data_root: str = "$DATA_ROOT"):
    """Download the Geo-FNO datasets folder (download.py:66-77)."""
    gdown = _require_gdown()
    workdir = Path(os.path.expandvars(data_root))
    workdir.mkdir(parents=True, exist_ok=True)
    cwd = os.getcwd()
    try:
        os.chdir(workdir)
        gdown.download_folder(GEO_FNO_FOLDER)
        if (workdir / "Geo-FNO").exists():
            os.rename(workdir / "Geo-FNO", workdir / "geo-fno")
    finally:
        os.chdir(cwd)


def meshgraphnets(data_dir: str = "data/meshgraphnets", settings=None):
    """Download the DeepMind meshgraphnets TFRecords (download.py:80-97)."""
    for setting in settings or MGN_SETTINGS:
        out_dir = Path(data_dir) / setting
        out_dir.mkdir(parents=True, exist_ok=True)
        for fname in MGN_FILES:
            out_path = out_dir / fname
            if out_path.exists():
                continue
            url = f"{MGN_BASE_URL}/{setting}/{fname}"
            logger.info("Getting %s", out_path)
            download_file(url, out_path)
