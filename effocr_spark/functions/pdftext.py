"""Minimal REAL PDF text extraction (the north rule's "PDF/layout
parse" branch).

Scope: text-bearing PDFs with uncompressed or FlateDecode content
streams — the common born-digital case. Pure stdlib (zlib + re), no
external PDF library; encrypted / exotic-filter / scanned-image PDFs
quarantine cleanly (the OCR branch is the right path for scans anyway).

Layout model (the "parse" part): text is grouped into BT..ET blocks;
show operators (Tj, ', ", TJ) append to the current line; the line
advances on T*, on Td/TD with a vertical component, and on the
quote operators (which are defined as T* + show). TJ kerning numbers
more negative than -180 text-space units are treated as an inter-word
gap (the standard heuristic for extracting spaces from kerned text).
Pages are joined with a newline.

Shared by the Spark pandas-UDF branch (operators/extract.pdf_branch)
and the tests, so byte-parity is by construction — the same contract
as functions/domstrip.py.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)
_BT_RE = re.compile(rb"BT(.*?)ET", re.S)
# one text-showing or line-advancing operator at a time, in order
_OP_RE = re.compile(
    rb"\((?P<s>(?:\\.|[^\\()])*)\)\s*(?P<op>Tj|'|\")"   # (..) Tj / ' / "
    rb"|\[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ"                # [..] TJ
    rb"|(?P<tstar>T\*)"                                   # T*
    rb"|(?P<tx>-?[\d.]+)\s+(?P<ty>-?[\d.]+)\s+(?:Td|TD)",  # x y Td/TD
    re.S,
)
_SEG_RE = re.compile(rb"\((?P<s>(?:\\.|[^\\()])*)\)|(?P<n>-?[\d.]+)")
_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
        b"(": b"(", b")": b")", b"\\": b"\\"}

# TJ kerning more negative than this (text-space units/1000) reads as a
# word gap — the standard space-recovery heuristic
TJ_SPACE_THRESHOLD = -180.0


def is_pdf(data: bytes) -> bool:
    return data[:5] == b"%PDF-"


def _unescape(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1:i + 2]
            if nxt in _ESC:
                out += _ESC[nxt]
                i += 2
                continue
            if nxt in b"01234567":  # octal \ooo (1-3 octal digits only;
                # \8 and \9 are NOT octal — they fall through to the
                # drop-backslash branch per the PDF spec's "unrecognized
                # escape keeps the character" rule)
                j = i + 1
                while j < min(i + 4, len(raw)) and raw[j] in b"01234567":
                    j += 1
                out.append(int(raw[i + 1: j], 8) & 0xFF)
                i = j
                continue
            i += 1  # line continuation / unknown escape: drop backslash
            continue
        out += c
        i += 1
    return bytes(out)


def _block_text(block: bytes) -> list[bytes]:
    """One BT..ET block → list of line byte-strings."""
    lines: list[bytearray] = [bytearray()]
    for m in _OP_RE.finditer(block):
        if m.group("s") is not None:
            if m.group("op") in (b"'", b'"'):  # defined as T* + show
                lines.append(bytearray())
            lines[-1] += _unescape(m.group("s"))
        elif m.group("arr") is not None:
            for seg in _SEG_RE.finditer(m.group("arr")):
                if seg.group("s") is not None:
                    lines[-1] += _unescape(seg.group("s"))
                elif float(seg.group("n")) < TJ_SPACE_THRESHOLD:
                    lines[-1] += b" "
        elif m.group("tstar") is not None:
            lines.append(bytearray())
        else:  # Td / TD
            if float(m.group("ty")) != 0.0:
                lines.append(bytearray())
    return [bytes(ln) for ln in lines]


def extract_pdf_text(data: bytes) -> str:
    """PDF bytes → extracted text ('' when no text content found).

    Raises on undecodable containers (caller quarantines): not-a-PDF,
    encrypted documents, streams with filters other than FlateDecode.
    """
    if not is_pdf(data):
        raise ValueError("not a PDF (missing %PDF- header)")
    if b"/Encrypt" in data:
        raise NotImplementedError("encrypted PDF; plug a real PDF library in")
    lines: list[bytes] = []
    for dict_part, body in _STREAM_RE.findall(data):
        if b"/Filter" in dict_part:
            if b"/FlateDecode" not in dict_part:
                raise NotImplementedError(
                    "unsupported stream filter; plug a real PDF library in")
            try:
                body = zlib.decompress(body.strip(b"\r\n"))
            except zlib.error:
                # some writers keep trailing EOL bytes in /Length; retry raw
                body = zlib.decompress(body)
        for block in _BT_RE.findall(body):
            lines.extend(_block_text(block))
    text = "\n".join(
        ln.decode("latin-1") for ln in lines if ln.strip())
    return text
