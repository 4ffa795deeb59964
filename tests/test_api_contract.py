"""Golden wire-contract tests.

Unlike the reference's regex proto parser (reference:
``tests/test_api_contract.py:41-188``), these diff the *compiled descriptors*
(what actually hits the wire) against the pinned JSON, catching divergence
between ``stt.proto`` and the generated code as well.
"""

import json
import os
import re

import grpc
import pytest

from stt_tpu import errors
from stt_tpu.gen import stt_pb2

COMPAT_DIR = os.path.join(os.path.dirname(__file__), "compat")


def _load(name):
    with open(os.path.join(COMPAT_DIR, name)) as f:
        return json.load(f)


_LABELS = {1: "optional", 2: "required", 3: "repeated"}

_TYPE_NAMES = {
    1: "double", 2: "float", 3: "int64", 4: "uint64", 5: "int32",
    6: "fixed64", 7: "fixed32", 8: "bool", 9: "string", 11: "message",
    12: "bytes", 13: "uint32", 14: "enum", 17: "sint32", 18: "sint64",
}


def _field_entry(field) -> dict:
    """Normalize a FieldDescriptor to the contract-JSON schema."""
    if field.type == field.TYPE_MESSAGE and field.message_type.GetOptions().map_entry:
        entry = field.message_type
        ktype = _TYPE_NAMES[entry.fields_by_name["key"].type]
        vtype = _TYPE_NAMES[entry.fields_by_name["value"].type]
        type_name = f"map<{ktype},{vtype}>"
        label = "map"
    elif field.type == field.TYPE_ENUM:
        type_name = field.enum_type.name
        label = "singular"
    elif field.type == field.TYPE_MESSAGE:
        type_name = field.message_type.name
        label = "singular"
    else:
        type_name = _TYPE_NAMES[field.type]
        label = "singular"
    if label == "singular":
        is_repeated = getattr(field, "is_repeated", None)
        if callable(is_repeated):
            is_repeated = is_repeated()
        if is_repeated is None:
            is_repeated = field.label == field.LABEL_REPEATED
        if is_repeated:
            label = "repeated"
        elif field.has_presence and field.containing_oneof is not None:
            # proto3 `optional` is modeled as a synthetic oneof
            label = "optional"
    return {
        "name": field.name,
        "number": field.number,
        "type": type_name,
        "label": label,
    }


@pytest.mark.parametrize(
    "message", ["SessionRequest", "SessionResponse", "AudioChunk", "STTResult"]
)
def test_proto_fields_match_contract(message):
    contract = _load("stt_proto_contract.json")
    descriptor = getattr(stt_pb2, message).DESCRIPTOR
    actual = {f.name: _field_entry(f) for f in descriptor.fields}
    for pinned in contract[message]:
        assert pinned["name"] in actual, (
            f"{message}.{pinned['name']} missing from compiled proto"
        )
        assert actual[pinned["name"]] == pinned, (
            f"{message}.{pinned['name']} diverged: {actual[pinned['name']]} != {pinned}"
        )


def test_proto_enums_match_reference_values():
    assert stt_pb2.VAD_CONTINUE == 0
    assert stt_pb2.VAD_AUTO_END == 1
    assert stt_pb2.TASK_UNSPECIFIED == 0
    assert stt_pb2.TASK_TRANSCRIBE == 1
    assert stt_pb2.TASK_TRANSLATE == 2
    assert stt_pb2.DECODE_PROFILE_UNSPECIFIED == 0
    assert stt_pb2.DECODE_PROFILE_REALTIME == 1
    assert stt_pb2.DECODE_PROFILE_ACCURATE == 2


def test_service_method_paths():
    # The gRPC method paths are part of the wire contract.
    from stt_tpu.gen import stt_pb2_grpc

    assert stt_pb2_grpc._CREATE_SESSION == "/stt.STTBackend/CreateSession"
    assert stt_pb2_grpc._STREAMING_RECOGNIZE == "/stt.STTBackend/StreamingRecognize"


def test_reserved_fields_covered():
    contract = _load("proto_reserved_contract.json")
    proto_path = os.path.join(
        os.path.dirname(COMPAT_DIR), "..", "stt_tpu", "proto", "stt.proto"
    )
    with open(proto_path) as f:
        proto_src = f.read()
    for entry in contract["entries"]:
        message, number, name = entry["message"], entry["number"], entry["name"]
        block = re.search(
            rf"message\s+{message}\s*\{{(.*?)^\}}", proto_src, re.S | re.M
        )
        assert block, f"message {message} not found in stt.proto"
        body = block.group(1)
        assert re.search(rf"reserved[^;]*\b{number}\b", body), (
            f"{message}: field number {number} must be reserved"
        )
        assert re.search(rf'reserved[^;]*"{name}"', body), (
            f"{message}: field name {name!r} must be reserved"
        )


def test_error_code_contract():
    contract = _load("error_code_contract.json")
    for key, pinned in contract.items():
        if key == "//":
            continue
        code = errors.ErrorCode[key]
        spec = errors.spec_for(code)
        assert spec.status == getattr(grpc.StatusCode, pinned["grpc"]), key
        assert spec.http_status == pinned["http"], key


def test_error_wire_format():
    err = errors.STTError(errors.ErrorCode.DECODE_TIMEOUT)
    assert str(err).startswith("ERR2001 ")
    assert errors.format_error(errors.ErrorCode.SESSION_ID_REQUIRED, "custom") == (
        "ERR1001 custom"
    )
    payload = errors.http_payload_for(errors.ErrorCode.ADMIN_UNAUTHORIZED)
    assert payload == {"code": "ERR4004", "message": "Invalid or missing admin token"}


def test_every_error_code_has_spec():
    for code in errors.ErrorCode:
        spec = errors.spec_for(code)
        assert isinstance(spec.http_status, int)
        assert spec.message
