"""EXIF metadata for JPEG payloads: parse, and the GPS/PII strip.

The metadata half of image-corpus curation the engine's codecs did not
yet cover: real crawled JPEGs carry an APP1 Exif segment (a TIFF
structure per the public EXIF/TIFF 6.0 specs) whose tags drive both
filtering (camera make/model, timestamps) and PRIVACY scrubbing — GPS
coordinates in training images are PII, and the standard pipeline step
is "extract what you filter on, then strip the segment". Both
directions here are real byte-level implementations:

* :func:`parse_exif` walks JPEG markers to APP1 ``Exif\\0\\0``, then
  the TIFF structure — byte order (II/MM both), IFD0 entries, the GPS
  sub-IFD, ASCII/SHORT/LONG/RATIONAL values — under the same
  ValueError-only quarantine contract as every decoder here (offsets
  validated, entry counts capped, truncation anywhere raises).
* :func:`strip_exif` removes APP1 segments only, leaving the entropy
  stream untouched — the scrubbed image decodes bit-identically
  (asserted by the oracle query mm_exif_gps_redact and tests).
* :func:`build_exif_jpeg` is the hermetic builder (a real TIFF writer)
  that makes the parser testable without third-party fixtures and
  exercises both byte orders.

Reference parity note: the reference warehouse stores media as opaque
blobs and has no metadata extraction; this extends the multimodal
suite the way decode_png_text did for PNG tEXt.

Scale: metadata lives in the first few KB of each object; the parse
never touches the entropy stream, so an extract-and-filter pass costs
header IO, not decode CPU — the filter-before-decode ordering a 100 TB
image corpus wants (same argument as mm_png_metadata).
"""

from __future__ import annotations

import struct

# entry-count / segment-size caps: a forged header must fail before
# any large allocation (the jpeg._MAX_PIXELS discipline)
_MAX_IFD_ENTRIES = 256
_MAX_APP1 = 0xFFFF  # the 16-bit length field's maximum (includes itself)

_TAGS_IFD0 = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x0132: "datetime",
}
_TAG_GPS_IFD = 0x8825
_TAGS_GPS = {
    0x0001: "gps_lat_ref",
    0x0002: "gps_lat",
    0x0003: "gps_lon_ref",
    0x0004: "gps_lon",
}
# TIFF type → element size
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_value(tiff: bytes, endian: str, vtype: int, count: int,
                value_field: bytes) -> object:
    """One IFD entry's value: inline when <= 4 bytes, else at the
    offset the value field points to (validated)."""
    if vtype not in _TYPE_SIZES:
        raise ValueError(f"unsupported EXIF value type {vtype}")
    size = _TYPE_SIZES[vtype] * count
    if size <= 4:
        raw = value_field[:size]
    else:
        (off,) = struct.unpack(endian + "I", value_field)
        if off + size > len(tiff):
            raise ValueError("EXIF value offset out of bounds")
        raw = tiff[off : off + size]
    if vtype == 2:  # ASCII, NUL-terminated
        return raw.split(b"\x00", 1)[0].decode("ascii", "replace")
    if vtype == 1:
        return list(raw)
    if vtype == 3:
        return list(struct.unpack(endian + "H" * count, raw))
    if vtype == 4:
        return list(struct.unpack(endian + "I" * count, raw))
    rats = struct.unpack(endian + "II" * count, raw)
    return [(rats[2 * i], rats[2 * i + 1]) for i in range(count)]


def _parse_ifd(tiff: bytes, endian: str, off: int,
               tags: dict[int, str]) -> tuple[dict, dict[int, object]]:
    """One IFD at ``off`` → (named tag values, raw tag→value map)."""
    if off + 2 > len(tiff):
        raise ValueError("EXIF IFD offset out of bounds")
    (n,) = struct.unpack_from(endian + "H", tiff, off)
    if n > _MAX_IFD_ENTRIES:
        raise ValueError(f"EXIF IFD entry count {n} exceeds cap")
    if off + 2 + 12 * n + 4 > len(tiff):
        raise ValueError("EXIF IFD truncated")
    named: dict = {}
    raw: dict[int, object] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, vtype, count = struct.unpack_from(endian + "HHI", tiff, base)
        if count > _MAX_IFD_ENTRIES:
            raise ValueError(f"EXIF value count {count} exceeds cap")
        val = _read_value(
            tiff, endian, vtype, count, tiff[base + 8 : base + 12]
        )
        raw[tag] = val
        if tag in tags:
            named[tags[tag]] = val
    return named, raw


def _app1_segments(data: bytes):
    """Yield (start, end) spans of APP1 segments via the JPEG marker
    walk (same framing discipline as jpeg.py: length includes the
    2 length bytes; entropy stream starts after SOS)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync in header walk")
        # ITU T.81 §B.1.1.2: any number of 0xFF fill bytes may pad
        # before a marker — skip the run so the marker byte read below
        # is the first non-FF (a fill run is NOT a bogus length field)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(data):
            break
        marker = data[pos + 1]
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: done
            return
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if seglen < 2 or pos + 2 + seglen > len(data):
            raise ValueError("truncated JPEG segment")
        if marker == 0xE1:
            yield pos, pos + 2 + seglen
        pos += 2 + seglen
    # fell off the end without reaching SOS/EOI: a payload cut exactly
    # at a segment boundary must not read as "clean, no EXIF" — a GPS
    # scrub that silently passes a truncated object is a PII leak
    raise ValueError("truncated JPEG header (no SOS/EOI reached)")


def parse_exif(data: bytes) -> dict:
    """JPEG bytes → EXIF dict: make, model, orientation, datetime,
    gps (None or dict with lat/lon refs and rational triples), plus
    byte_order ('II'/'MM'). Returns has_exif=False when no APP1 Exif
    segment exists; malformed structures raise ValueError."""
    # materialize the full header walk FIRST so truncation anywhere in
    # the header raises even when an earlier Exif segment is complete
    for start, end in list(_app1_segments(data)):
        body = data[start + 4 : end]
        if not body.startswith(b"Exif\x00\x00"):
            continue
        tiff = body[6:]
        if len(tiff) < 8:
            raise ValueError("EXIF TIFF header truncated")
        order = tiff[:2]
        if order == b"II":
            endian = "<"
        elif order == b"MM":
            endian = ">"
        else:
            raise ValueError(f"bad TIFF byte order {order!r}")
        magic, ifd0 = struct.unpack_from(endian + "HI", tiff, 2)
        if magic != 42:
            raise ValueError(f"bad TIFF magic {magic}")
        named, raw = _parse_ifd(tiff, endian, ifd0, _TAGS_IFD0)
        gps = None
        if _TAG_GPS_IFD in raw:
            ptr = raw[_TAG_GPS_IFD]
            # the pointer must be ONE integer (type SHORT/LONG): an
            # ASCII value decodes to str and a RATIONAL to a tuple —
            # both must fail closed as ValueError, never TypeError in
            # the IFD bounds arithmetic
            if (
                not isinstance(ptr, list)
                or len(ptr) != 1
                or not isinstance(ptr[0], int)
            ):
                raise ValueError("bad GPS IFD pointer")
            gps, _ = _parse_ifd(tiff, endian, ptr[0], _TAGS_GPS)
        out = {
            "has_exif": True,
            "byte_order": order.decode("ascii"),
            "gps": gps,
        }
        out.update(named)
        return out
    return {"has_exif": False, "byte_order": None, "gps": None}


def strip_exif(data: bytes) -> bytes:
    """Remove every APP1 segment — the GPS/PII scrub. Byte surgery on
    the header only: the entropy stream and every other segment are
    untouched, so the scrubbed JPEG decodes bit-identically."""
    spans = list(_app1_segments(data))
    if not spans:
        return data
    out = bytearray()
    pos = 0
    for start, end in spans:
        out += data[pos:start]
        pos = end
    out += data[pos:]
    return bytes(out)


def _ifd_bytes(endian: str, entries: list[tuple[int, int, int, bytes]],
               data_off: int) -> tuple[bytes, bytes]:
    """Serialize one IFD: entries are (tag, type, count, packed value
    bytes); values longer than 4 bytes land in a data area starting at
    ``data_off``. Returns (ifd bytes, data area bytes)."""
    body = struct.pack(endian + "H", len(entries))
    area = b""
    for tag, vtype, count, val in sorted(entries):
        body += struct.pack(endian + "HHI", tag, vtype, count)
        if len(val) <= 4:
            body += val.ljust(4, b"\x00")
        else:
            body += struct.pack(endian + "I", data_off + len(area))
            area += val
    body += struct.pack(endian + "I", 0)  # no next IFD
    return body, area


def build_exif_jpeg(
    pixels,
    make: str = "EngineCam",
    model: str = "Mark I",
    orientation: int = 1,
    datetime_str: str = "2026:01:01 00:00:00",
    gps: tuple[float, float] | None = None,
    byte_order: str = "II",
) -> bytes:
    """Encode ``pixels`` with the engine's real JPEG encoder and insert
    an APP1 Exif segment (a real TIFF writer, both byte orders). GPS
    coordinates serialize as the spec's (deg, min, sec*100) RATIONAL
    triples with N/S / E/W refs."""
    from evolution_data_warehouse_spark.operators.jpeg import encode_jpeg

    endian = "<" if byte_order == "II" else ">"

    def ascii_v(s: str) -> bytes:
        return s.encode("ascii") + b"\x00"

    entries = [
        (0x010F, 2, len(make) + 1, ascii_v(make)),
        (0x0110, 2, len(model) + 1, ascii_v(model)),
        (0x0112, 3, 1, struct.pack(endian + "H", orientation)),
        (0x0132, 2, len(datetime_str) + 1, ascii_v(datetime_str)),
    ]
    gps_ifd = b""
    gps_area = b""
    if gps is not None:
        lat, lon = gps

        def rat3(v: float) -> bytes:
            av = abs(v)
            d = int(av)
            m = int((av - d) * 60)
            s100 = round(((av - d) * 60 - m) * 60 * 100)
            return struct.pack(
                endian + "IIIIII", d, 1, m, 1, s100, 100
            )

        # IFD0 first; compute offsets after sizing IFD0
        gps_entries = [
            (0x0001, 2, 2, ascii_v("N" if lat >= 0 else "S")),
            (0x0002, 5, 3, rat3(lat)),
            (0x0003, 2, 2, ascii_v("E" if lon >= 0 else "W")),
            (0x0004, 5, 3, rat3(lon)),
        ]
        n0 = len(entries) + 1  # + GPS pointer entry
        ifd0_size = 2 + 12 * n0 + 4
        ifd0_data = sum(
            len(v) for _, _, _, v in entries if len(v) > 4
        )
        gps_off = 8 + ifd0_size + ifd0_data
        gps_n = len(gps_entries)
        gps_size = 2 + 12 * gps_n + 4
        gps_ifd, gps_area = _ifd_bytes(
            endian, gps_entries, gps_off + gps_size
        )
        entries.append(
            (_TAG_GPS_IFD, 4, 1, struct.pack(endian + "I", gps_off))
        )
    n0 = len(entries)
    ifd0_size = 2 + 12 * n0 + 4
    ifd0, area0 = _ifd_bytes(endian, entries, 8 + ifd0_size)
    tiff = (
        byte_order.encode("ascii")
        + struct.pack(endian + "HI", 42, 8)
        + ifd0
        + area0
        + gps_ifd
        + gps_area
    )
    body = b"Exif\x00\x00" + tiff
    if len(body) + 2 > _MAX_APP1:
        raise ValueError("EXIF segment too large")
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    jpg = encode_jpeg(pixels)
    return jpg[:2] + app1 + jpg[2:]
