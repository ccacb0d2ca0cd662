"""Waymo metrics_pb2.Objects writer: golden bytes + cross-validation against
a protoc-compiled copy of the public schema (protoc is in the image; the
waymo_open_dataset package is not)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tmae_tpu.datasets import waymo_pb

PROTO = """
syntax = "proto2";
package waymo.open_dataset;

message Label {
  message Box {
    optional double center_x = 1;
    optional double center_y = 2;
    optional double center_z = 3;
    optional double width = 4;
    optional double length = 5;
    optional double height = 6;
    optional double heading = 7;
  }
  optional Box box = 1;
  enum Type {
    TYPE_UNKNOWN = 0;
    TYPE_VEHICLE = 1;
    TYPE_PEDESTRIAN = 2;
    TYPE_SIGN = 3;
    TYPE_CYCLIST = 4;
  }
  optional Type type = 3;
  optional string id = 4;
}

message Object {
  optional Label object = 1;
  optional float score = 2;
  optional bool overlap_with_nlz = 3;
  optional string context_name = 4;
  optional int64 frame_timestamp_micros = 5;
}

message Objects {
  repeated Object objects = 1;
}
"""

RECORDS = [
    {'box7': [1.5, -2.0, 0.5, 4.2, 1.9, 1.6, 0.3], 'score': 0.75,
     'name': 'Vehicle', 'context_name': 'ctx_abc',
     'timestamp_micros': 1234567890},
    {'box7': [-3.0, 7.0, 1.0, 0.8, 0.8, 1.7, -1.2], 'score': 0.25,
     'name': 'Pedestrian', 'context_name': 'ctx_abc',
     'timestamp_micros': 1234567890},
]


def test_serialize_matches_protoc_schema(tmp_path):
    (tmp_path / 'wod.proto').write_text(PROTO)
    r = subprocess.run(
        ['protoc', f'--python_out={tmp_path}', 'wod.proto'],
        cwd=tmp_path, capture_output=True, text=True,
    )
    if r.returncode != 0:
        pytest.skip(f'protoc unavailable/failed: {r.stderr}')
    sys.path.insert(0, str(tmp_path))
    try:
        import wod_pb2
    finally:
        sys.path.pop(0)

    objects = wod_pb2.Objects()
    for rec in RECORDS:
        o = objects.objects.add()
        x, y, z, dx, dy, dz, heading = rec['box7']
        o.object.box.center_x = x
        o.object.box.center_y = y
        o.object.box.center_z = z
        o.object.box.length = dx
        o.object.box.width = dy
        o.object.box.height = dz
        o.object.box.heading = heading
        o.object.type = waymo_pb.WAYMO_CLASSES.index(rec['name'])
        o.score = rec['score']
        o.context_name = rec['context_name']
        o.frame_timestamp_micros = rec['timestamp_micros']

    assert waymo_pb.serialize_objects(RECORDS) == objects.SerializeToString()


def test_golden_bytes_single_object():
    """Frozen wire bytes for one object — guards the writer against encoding
    regressions independently of protoc availability."""
    rec = {'box7': [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 0.5], 'score': 0.5,
           'name': 'Cyclist', 'context_name': 'c', 'timestamp_micros': 7}
    got = waymo_pb.serialize_objects([rec])
    import struct

    box = (b'\x09' + struct.pack('<d', 1.0)
           + b'\x11' + struct.pack('<d', 2.0)
           + b'\x19' + struct.pack('<d', 3.0)
           + b'\x21' + struct.pack('<d', 5.0)   # width  (field 4) = dy
           + b'\x29' + struct.pack('<d', 4.0)   # length (field 5) = dx
           + b'\x31' + struct.pack('<d', 6.0)
           + b'\x39' + struct.pack('<d', 0.5))
    label = b'\x0a' + bytes([len(box)]) + box + b'\x18\x04'  # type=CYCLIST
    obj = (b'\x0a' + bytes([len(label)]) + label
           + b'\x15' + struct.pack('<f', 0.5)
           + b'\x22\x01c'
           + b'\x28\x07')
    want = b'\x0a' + bytes([len(obj)]) + obj
    assert got == want


def test_write_pd_detection(tmp_path):
    infos = [{'frame_id': 'seq_000',
              'metadata': {'context_name': 'ctx', 'timestamp_micros': 42}}]
    dets = [{'name': np.array(['Vehicle']), 'score': np.array([0.9]),
             'boxes_lidar': np.array([[0, 0, 0, 4, 2, 1.5, 0.0]])}]
    out = waymo_pb.write_pd_detection(dets, infos, tmp_path / 'pred.bin')
    data = out.read_bytes()
    assert len(data) > 0 and data[0] == 0x0A
