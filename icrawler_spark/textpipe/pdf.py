"""From-scratch minimal PDF text extractor (stdlib only).

The reference extracts PDF text through pdfminer (ref
text_pipeline.py:527-540, wired via ``_pdf_text_extractor``); pdfminer is
not available in this sandbox, so — in the same spirit as the from-scratch
WARC/bs4/DOM work — this module implements the common case directly from
the published PDF 1.7 spec (ISO 32000-1):

- object discovery by scanning ``N G obj … endobj`` (no xref needed; works
  on linearized and incrementally-updated files alike),
- a recursive-descent parser for the PDF object grammar (dicts, arrays,
  names, numbers, literal/hex strings, refs, booleans, null),
- ``/FlateDecode`` streams via stdlib zlib (uncompressed streams pass
  through),
- the page tree walk (Catalog → Pages → Kids), per-page ``/Contents`` and
  ``/Resources /Font``,
- content-stream text operators: ``BT ET Tf TL Td TD T* Tm Tj TJ ' "``,
- simple fonts decoded latin-1-ish (WinAnsi ≈ latin-1 over the range that
  matters for western text) and composite Type0 fonts via their
  ``/ToUnicode`` CMap (``bfchar`` + ``bfrange``) — the standard path for
  CJK text.

Honestly OUT of scope (raise :class:`PdfParseError`, which the caller maps
to ``pdf_parse_error`` exactly as the reference maps pdfminer exceptions;
scanned/empty pages yield empty text → the existing ``needs_ocr`` flow):
encryption, object streams (/ObjStm), LZW/CCITT/JBIG2/JPX filters, png
predictors, and fonts with non-latin built-in encodings but no ToUnicode.

Layout → lines: a text-position move down by more than
``_PARA_GAP_FACTOR ×`` the current leading (or font size) emits a blank
line (paragraph gap), a smaller move emits a newline, and pages join with
``\\f`` — the same raw shape pdfminer feeds the (already golden-tested)
``normalize_pdf_text``.
"""

from __future__ import annotations

import re
import zlib

_PARA_GAP_FACTOR = 1.6
# TJ kerning more negative than this (thousandths of em) renders as a space
_TJ_SPACE_KERN = -180


class PdfParseError(ValueError):
    pass


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num


class _Name(str):
    """PDF name object (distinct from decoded strings)."""


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Parser:
    """Recursive-descent parser over raw PDF bytes."""

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.i = pos

    def _skip_ws(self) -> None:
        d, n = self.d, len(self.d)
        while self.i < n:
            c = self.d[self.i]
            if c in _WS:
                self.i += 1
            elif c == 0x25:  # % comment to EOL
                j = d.find(b"\n", self.i)
                self.i = n if j < 0 else j + 1
            else:
                return

    def parse(self):
        self._skip_ws()
        if self.i >= len(self.d):
            raise PdfParseError("unexpected EOF")
        c = self.d[self.i]
        if self.d.startswith(b"<<", self.i):
            return self._dict()
        if c == 0x3C:  # <hex>
            return self._hex_string()
        if c == 0x28:  # (literal)
            return self._lit_string()
        if c == 0x2F:  # /Name
            return self._name()
        if c == 0x5B:  # [array]
            return self._array()
        if self.d.startswith(b"true", self.i):
            self.i += 4
            return True
        if self.d.startswith(b"false", self.i):
            self.i += 5
            return False
        if self.d.startswith(b"null", self.i):
            self.i += 4
            return None
        return self._number_or_ref()

    def _dict(self):
        self.i += 2
        out: dict[str, object] = {}
        while True:
            self._skip_ws()
            if self.d.startswith(b">>", self.i):
                self.i += 2
                return out
            key = self.parse()
            if not isinstance(key, _Name):
                raise PdfParseError("dict key is not a name")
            out[str(key)] = self.parse()

    def _array(self):
        self.i += 1
        out = []
        while True:
            self._skip_ws()
            if self.i < len(self.d) and self.d[self.i] == 0x5D:
                self.i += 1
                return out
            out.append(self.parse())

    def _name(self) -> _Name:
        self.i += 1
        start = self.i
        d, n = self.d, len(self.d)
        while self.i < n and d[self.i] not in _WS and d[self.i] not in _DELIM:
            self.i += 1
        raw = d[start:self.i]
        # #xx escapes in names
        if b"#" in raw:
            raw = re.sub(rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw)
        return _Name(raw.decode("latin-1"))

    def _hex_string(self) -> bytes:
        end = self.d.find(b">", self.i)
        if end < 0:
            raise PdfParseError("unterminated hex string")
        hexed = re.sub(rb"[^0-9A-Fa-f]", b"", self.d[self.i + 1 : end])
        self.i = end + 1
        if len(hexed) % 2:
            hexed += b"0"
        return bytes.fromhex(hexed.decode("ascii"))

    def _lit_string(self) -> bytes:
        d = self.d
        i = self.i + 1
        depth = 1
        out = bytearray()
        esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}
        while i < len(d):
            c = d[i]
            if c == 0x5C:  # backslash
                i += 1
                if i >= len(d):
                    break
                e = d[i]
                if e in esc:
                    out.append(esc[e])
                    i += 1
                elif 0x30 <= e <= 0x37:  # octal
                    j = i
                    while j < len(d) and j - i < 3 and 0x30 <= d[j] <= 0x37:
                        j += 1
                    out.append(int(d[i:j], 8) & 0xFF)
                    i = j
                elif e in (0x0A, 0x0D):  # line continuation
                    i += 1
                    if e == 0x0D and i < len(d) and d[i] == 0x0A:
                        i += 1
                else:
                    out.append(e)
                    i += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.i = i + 1
                    return bytes(out)
                out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        raise PdfParseError("unterminated literal string")

    def _number_or_ref(self):
        m = re.compile(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)").match(self.d, self.i)
        if not m:
            raise PdfParseError(f"bad token at {self.i}")
        self.i = m.end()
        tok = m.group()
        if b"." in tok:
            return float(tok)
        val = int(tok)
        # "n g R" → indirect reference
        m2 = re.compile(rb"\s+(\d+)\s+R(?![A-Za-z0-9])").match(self.d, self.i)
        if m2 is not None and val >= 0:
            self.i = m2.end()
            return _Ref(val)
        return val


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")


class _Doc:
    def __init__(self, data: bytes):
        if not data.lstrip()[:5].startswith(b"%PDF"):
            raise PdfParseError("not a PDF (missing %PDF header)")
        self.objs: dict[int, object] = {}
        self.streams: dict[int, bytes] = {}
        last_end = 0
        for m in _OBJ_RE.finditer(data):
            if m.start() < last_end:
                continue  # inside the previous object (e.g. stream bytes)
            num = int(m.group(1))
            end = data.find(b"endobj", m.end())
            span_end = end if end >= 0 else len(data)
            last_end = span_end
            try:
                val = _Parser(data, m.end()).parse()
            except PdfParseError:
                continue
            sm = _STREAM_RE.search(data, m.end(), span_end)
            if sm is not None:
                se = data.rfind(b"endstream", sm.end(), span_end + len(b"endstream"))
                raw = data[sm.end() : se if se >= 0 else span_end]
                # trailing EOL before endstream is not stream data
                if raw.endswith(b"\r\n"):
                    raw = raw[:-2]
                elif raw.endswith(b"\n") or raw.endswith(b"\r"):
                    raw = raw[:-1]
                self.streams[num] = raw
            self.objs[num] = val
        if not self.objs:
            raise PdfParseError("no objects found")

    def deref(self, v):
        seen = set()
        while isinstance(v, _Ref):
            if v.num in seen:
                raise PdfParseError("circular reference")
            seen.add(v.num)
            v = self.objs.get(v.num)
        return v

    def stream_data(self, ref) -> bytes:
        if not isinstance(ref, _Ref) or ref.num not in self.streams:
            raise PdfParseError("expected a stream object")
        d = self.deref(ref)
        raw = self.streams[ref.num]
        filt = self.deref(d.get("Filter")) if isinstance(d, dict) else None
        filters = filt if isinstance(filt, list) else ([filt] if filt else [])
        for f in filters:
            f = self.deref(f)
            if str(f) == "FlateDecode":
                try:
                    raw = zlib.decompress(raw)
                except zlib.error as e:
                    raise PdfParseError(f"bad Flate stream: {e}") from e
            else:
                raise PdfParseError(f"unsupported stream filter {f!r}")
        return raw

    def pages(self) -> list[dict]:
        root = None
        for v in self.objs.values():
            v = self.deref(v)
            if isinstance(v, dict) and str(v.get("Type")) == "Catalog":
                root = self.deref(v.get("Pages"))
                break
        if root is None:  # no catalog: fall back to any Page objects in order
            found = [
                self.deref(v)
                for v in self.objs.values()
                if isinstance(self.deref(v), dict)
                and str(self.deref(v).get("Type")) == "Page"
            ]
            if not found:
                raise PdfParseError("no page tree")
            return found
        out: list[dict] = []

        def walk(node, depth=0):
            node = self.deref(node)
            if not isinstance(node, dict) or depth > 64:
                return
            t = str(node.get("Type"))
            if t == "Page":
                out.append(node)
            else:
                for kid in self.deref(node.get("Kids")) or []:
                    walk(kid, depth + 1)

        walk(root)
        if not out:
            raise PdfParseError("empty page tree")
        return out


# --- ToUnicode CMap -----------------------------------------------------------

_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_CODESPACE_RE = re.compile(rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", re.S)


def _utf16be(hexed: bytes) -> str:
    return bytes.fromhex(hexed.decode("ascii")).decode("utf-16-be", errors="replace")


def parse_tounicode(cmap: bytes) -> tuple[int, dict[int, str]]:
    """ToUnicode CMap → (code byte-width, {code: text})."""
    width = 2
    m = _CODESPACE_RE.search(cmap)
    if m:
        width = max(1, len(m.group(1)) // 2)
    table: dict[int, str] = {}
    for block in _BFCHAR_RE.findall(cmap):
        hexes = _HEX_RE.findall(block)
        for src, dst in zip(hexes[0::2], hexes[1::2]):
            table[int(src, 16)] = _utf16be(dst)
    for block in _BFRANGE_RE.findall(cmap):
        # two forms: <lo> <hi> <dst>   |   <lo> <hi> [<d0> <d1> …]
        pos = 0
        while True:
            mm = re.compile(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[[^\]]*\]|<[0-9A-Fa-f]+>)"
            ).search(block, pos)
            if not mm:
                break
            lo, hi = int(mm.group(1), 16), int(mm.group(2), 16)
            dst = mm.group(3)
            if dst.startswith(b"["):
                dsts = _HEX_RE.findall(dst)
                for k, code in enumerate(range(lo, hi + 1)):
                    if k < len(dsts):
                        table[code] = _utf16be(dsts[k])
            else:
                base_hex = _HEX_RE.match(dst).group(1)
                base = int(base_hex, 16)
                for k, code in enumerate(range(lo, hi + 1)):
                    table[code] = chr(base + k)
            pos = mm.end()
    return width, table


class _Font:
    def __init__(self, width: int = 1, cmap: dict[int, str] | None = None):
        self.width = width
        self.cmap = cmap

    def decode(self, raw: bytes) -> str:
        if self.cmap is None:
            return raw.decode("latin-1")
        w = self.width
        out = []
        for j in range(0, len(raw) - w + 1, w):
            code = int.from_bytes(raw[j : j + w], "big")
            out.append(self.cmap.get(code, ""))
        return "".join(out)


def _load_fonts(doc: _Doc, page: dict) -> dict[str, _Font]:
    fonts: dict[str, _Font] = {}
    res = doc.deref(page.get("Resources")) or {}
    fdict = doc.deref(res.get("Font")) if isinstance(res, dict) else None
    if not isinstance(fdict, dict):
        return fonts
    for name, fref in fdict.items():
        fobj = doc.deref(fref)
        if not isinstance(fobj, dict):
            continue
        tu = fobj.get("ToUnicode")
        if tu is not None:
            try:
                width, table = parse_tounicode(doc.stream_data(tu))
                fonts[name] = _Font(width, table)
                continue
            except PdfParseError:
                pass
        fonts[name] = _Font()
    return fonts


# --- content interpreter ------------------------------------------------------

_OP_RE = re.compile(rb"[A-Za-z'\"*]{1,3}")


class _TextState:
    def __init__(self, fonts: dict[str, _Font]):
        self.fonts = fonts
        self.font: _Font = _Font()
        self.size = 12.0
        self.leading = 0.0
        self.y: float | None = None
        self.lines: list[str] = []
        self.cur: list[str] = []

    def _flush_line(self) -> None:
        self.lines.append("".join(self.cur))
        self.cur = []

    def move(self, dy: float) -> None:
        """dy > 0 means the cursor moved DOWN the page."""
        if dy <= 0.01:
            return  # same line (or upwards — column resets are out of scope)
        self._flush_line()
        gap = _PARA_GAP_FACTOR * max(self.leading, self.size, 1.0)
        if dy > gap:
            self.lines.append("")

    def set_y(self, new_y: float) -> None:
        if self.y is not None:
            self.move(self.y - new_y)
        self.y = new_y

    def rel_y(self, ty: float) -> None:
        if self.y is None:
            self.y = 0.0
            return
        self.move(-ty)
        self.y += ty

    def show(self, raw: bytes) -> None:
        self.cur.append(self.font.decode(raw))

    def finish(self) -> list[str]:
        if self.cur:
            self._flush_line()
        return self.lines


def _page_text(content: bytes, fonts: dict[str, _Font]) -> str:
    p = _Parser(content)
    st = _TextState(fonts)
    stack: list = []
    d, n = content, len(content)
    while True:
        p._skip_ws()
        if p.i >= n:
            break
        c = d[p.i]
        if c in b"/<([+-.0123456789" or d.startswith(b"true", p.i) or d.startswith(b"false", p.i):
            try:
                stack.append(p.parse())
            except PdfParseError:
                p.i += 1
            continue
        m = _OP_RE.match(d, p.i)
        if not m:
            p.i += 1
            continue
        op = m.group()
        p.i = m.end()
        try:
            if op == b"Tf" and len(stack) >= 2:
                st.size = float(stack[-1])
                st.font = fonts.get(str(stack[-2]), _Font())
            elif op == b"TL" and stack:
                st.leading = float(stack[-1])
            elif op == b"Td" and len(stack) >= 2:
                st.rel_y(float(stack[-1]))
            elif op == b"TD" and len(stack) >= 2:
                st.leading = -float(stack[-1])
                st.rel_y(float(stack[-1]))
            elif op == b"T*":
                st.rel_y(-st.leading)
            elif op == b"Tm" and len(stack) >= 6:
                st.set_y(float(stack[-1]))
            elif op == b"Tj" and stack and isinstance(stack[-1], bytes):
                st.show(stack[-1])
            elif op == b"'" and stack and isinstance(stack[-1], bytes):
                st.rel_y(-st.leading)
                st.show(stack[-1])
            elif op == b'"' and stack and isinstance(stack[-1], bytes):
                st.rel_y(-st.leading)
                st.show(stack[-1])
            elif op == b"TJ" and stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, bytes):
                        st.show(el)
                    elif isinstance(el, (int, float)) and el < _TJ_SPACE_KERN:
                        st.cur.append(" ")
            elif op == b"BT":
                st.y = None
        except (TypeError, ValueError):
            pass
        stack = []
    return "\n".join(st.finish())


def extract_pdf_text(data: bytes) -> str:
    """PDF bytes → raw text: lines per page, blank line per paragraph gap,
    ``\\f`` between pages — the contract ``normalize_pdf_text`` expects.
    Raises :class:`PdfParseError` on anything outside the documented scope."""
    doc = _Doc(data)
    pages_text: list[str] = []
    for page in doc.pages():
        fonts = _load_fonts(doc, page)
        contents = page.get("Contents")
        parts = contents if isinstance(doc.deref(contents), list) else [contents]
        if isinstance(doc.deref(contents), list):
            parts = doc.deref(contents)
        blobs = []
        for part in parts:
            if part is None:
                continue
            blobs.append(doc.stream_data(part))
        pages_text.append(_page_text(b"\n".join(blobs), fonts))
    return "\f".join(pages_text)
