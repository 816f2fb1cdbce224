"""Convert DeepMind meshgraphnets TFRecord datasets to HDF5.

Equivalent of reference:fourierflow/commands/convert.py:52-155, but with
**no tensorflow dependency**: TFRecord framing and the tf.train.Example
protobuf wire format are parsed directly (both are small, stable binary
formats), so the converter runs in the slim TPU image.

Output layout (identical to the reference so existing HDF5 files work
interchangeably): per split ``train/valid/test``:
  n_cells [B] int32, n_nodes [B] int32, cells [B, maxC, 3] int32 (-1 pad),
  mesh_pos [B, maxN, 2] f32 (NaN pad), node_type [B, maxN] int32 (-1 pad),
  velocity / target_velocity [B, T, maxN, 2] f32 (NaN pad),
  pressure [B, T, maxN] f32 (NaN pad).
"""

import json
import logging
import struct
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["cylinder_flow", "read_tfrecord", "parse_example"]


def read_tfrecord(path):
    """Yield raw record payloads from a TFRecord file.

    Framing: uint64 length, uint32 masked-crc(length), payload,
    uint32 masked-crc(payload). CRCs are not verified (we only read files
    we just downloaded; numpy decode fails loudly on corruption anyway).
    """
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return
            (length,) = struct.unpack("<Q", header)
            f.read(4)  # length crc
            payload = f.read(length)
            f.read(4)  # payload crc
            yield payload


def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _parse_message(buf):
    """Parse one protobuf message into {field_number: [values]} where values
    are raw bytes (wire type 2) or ints (wire type 0)."""
    fields = {}
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field_num, wire_type = key >> 3, key & 0x7
        if wire_type == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire_type == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire_type == 5:  # 32-bit
            val = buf[pos : pos + 4]
            pos += 4
        elif wire_type == 1:  # 64-bit
            val = buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire_type}")
        fields.setdefault(field_num, []).append(val)
    return fields


def parse_example(payload):
    """Parse a tf.train.Example into {name: list-of-bytes} (BytesList
    features only — meshgraphnets stores everything as raw bytes).

    Proto schema walked by field number:
      Example{1: Features} / Features{1: map<string, Feature>} /
      MapEntry{1: key, 2: value} / Feature{1: BytesList} /
      BytesList{1: repeated bytes}.
    """
    example = _parse_message(payload)
    features_msg = _parse_message(example[1][0])
    out = {}
    for entry in features_msg.get(1, []):
        kv = _parse_message(entry)
        name = kv[1][0].decode("utf-8")
        feature = _parse_message(kv[2][0])
        values = []
        if 1 in feature:  # BytesList
            bytes_list = _parse_message(feature[1][0])
            values = bytes_list.get(1, [])
        out[name] = values
    return out


_DTYPES = {"float32": np.float32, "int32": np.int32, "int64": np.int64}


def _decode_trajectory(example, meta):
    """Decode one trajectory dict per the dataset's meta.json (mirrors the
    reference's _parse, convert.py:16-35)."""
    t_len = meta["trajectory_length"]
    out = {}
    for key, field in meta["features"].items():
        raw = b"".join(example[key])
        data = np.frombuffer(raw, dtype=_DTYPES[field["dtype"]])
        shape = [int(s) for s in field["shape"]]
        data = data.reshape([d if d >= 0 else -1 for d in shape])
        if field["type"] == "static":
            data = np.tile(data, (t_len, 1, 1))
        elif field["type"] == "dynamic_varlen":
            raise NotImplementedError("dynamic_varlen fields not used by cylinder_flow")
        elif field["type"] != "dynamic":
            raise ValueError("invalid data format")
        out[key] = data
    return out


def cylinder_flow(
    data_dir: str = "data/meshgraphnets/cylinder_flow",
    out: str = "data/meshgraphnets/cylinder_flow/cylinder_flow.h5",
):
    """Convert the cylinder_flow TFRecords (train/valid/test) to one HDF5
    file with max-size padding (convert.py:57-155)."""
    import h5py

    in_path = Path(data_dir)
    out_path = Path(out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(in_path / "meta.json") as fp:
        meta = json.load(fp)

    with h5py.File(out_path, "a") as h5f:
        for split in ("train", "valid", "test"):
            _process_split(split, meta, h5f, in_path)


def _process_split(split, meta, h5f, in_path):
    trajs = [
        _decode_trajectory(parse_example(p), meta)
        for p in read_tfrecord(in_path / f"{split}.tfrecord")
    ]
    # add_targets semantics (convert.py:38-48): drop first/last step, the
    # target field is the next step.
    n_samples = len(trajs)
    n_cells_l = [t["cells"].shape[1] for t in trajs]
    n_nodes_l = [t["mesh_pos"].shape[1] for t in trajs]
    n_steps = trajs[0]["cells"].shape[0] - 2
    max_cells, max_nodes = max(n_cells_l), max(n_nodes_l)
    logger.info("%s: %d samples, max_cells=%d max_nodes=%d", split, n_samples,
                max_cells, max_nodes)

    h5f.create_dataset(f"{split}/n_cells", data=np.asarray(n_cells_l, np.int32))
    h5f.create_dataset(f"{split}/n_nodes", data=np.asarray(n_nodes_l, np.int32))
    cells = h5f.create_dataset(
        f"{split}/cells", (n_samples, max_cells, 3), np.int32, fillvalue=-1)
    mesh_pos = h5f.create_dataset(
        f"{split}/mesh_pos", (n_samples, max_nodes, 2), np.float32, fillvalue=np.nan)
    node_type = h5f.create_dataset(
        f"{split}/node_type", (n_samples, max_nodes), np.int32, fillvalue=-1)
    velocity = h5f.create_dataset(
        f"{split}/velocity", (n_samples, n_steps, max_nodes, 2), np.float32,
        fillvalue=np.nan)
    target_velocity = h5f.create_dataset(
        f"{split}/target_velocity", (n_samples, n_steps, max_nodes, 2), np.float32,
        fillvalue=np.nan)
    pressure = h5f.create_dataset(
        f"{split}/pressure", (n_samples, n_steps, max_nodes), np.float32,
        fillvalue=np.nan)

    for i, t in enumerate(trajs):
        c, n = n_cells_l[i], n_nodes_l[i]
        cells[i, :c] = t["cells"][0]
        mesh_pos[i, :n] = t["mesh_pos"][0]
        node_type[i, :n] = t["node_type"][0, ..., 0]
        velocity[i, :, :n] = t["velocity"][1:-1]
        target_velocity[i, :, :n] = t["velocity"][2:]
        pressure[i, :, :n] = t["pressure"][1:-1, ..., 0]
