"""FASTA I/O, the ``name|length|start`` header codec, and base complementing.

Replaces the sonLib bioioC surface the reference consumes
(fastaReadToFunction / fastaReadToMap / fastaWrite / fastaEncodeHeader /
fastaDecodeHeader, see SURVEY.md section 2.5):

  * reading is wrap-agnostic; the full header line (after '>') is the name,
  * writing emits the sequence on a single line (valid FASTA; the reference's
    own merge tool emits unwrapped lines too, impl/fasta_merge.c:49,77),
  * headers encode chunk provenance as trailing ``|length|start`` fields;
    decode pops the last two '|'-separated fields as (start, length) and
    rejoins the rest as the name (decode_fasta_header, impl/paf.c:716-731).
"""

from __future__ import annotations

from dataclasses import dataclass
import numpy as np

# ---------------------------------------------------------------- complement

_COMP = {
    "a": "t", "c": "g", "g": "c", "t": "a",
    "A": "T", "C": "G", "G": "C", "T": "A",
    # IUPAC ambiguity codes (case-preserving), sonLib-compatible
    "m": "k", "r": "y", "w": "w", "s": "s", "y": "r", "k": "m",
    "v": "b", "h": "d", "d": "h", "b": "v", "n": "n", "x": "x",
    "M": "K", "R": "Y", "W": "W", "S": "S", "Y": "R", "K": "M",
    "V": "B", "H": "D", "D": "H", "B": "V", "N": "N", "X": "X",
}

COMPLEMENT_TABLE = np.arange(256, dtype=np.uint8)
for _k, _v in _COMP.items():
    COMPLEMENT_TABLE[ord(_k)] = ord(_v)

# uppercase table for case-insensitive base comparison (toupper in
# paf_encode_mismatches, impl/paf.c:755-757)
UPPER_TABLE = np.arange(256, dtype=np.uint8)
for _c in range(ord("a"), ord("z") + 1):
    UPPER_TABLE[_c] = _c - 32


def reverse_complement_char(c: str) -> str:
    return _COMP.get(c, c)


def reverse_complement(s: str) -> str:
    return "".join(_COMP.get(c, c) for c in reversed(s))


# ------------------------------------------------------------------ file I/O

def read_fasta(path_or_file) -> dict[str, str]:
    """Read FASTA into an ordered {header: sequence} dict.

    The header is the entire line after '>' (trailing whitespace stripped),
    matching sonLib's whole-line header semantics.
    """
    if hasattr(path_or_file, "read"):
        text = path_or_file.read()
    else:
        with open(path_or_file, "r") as fh:
            text = fh.read()
    out: dict[str, str] = {}
    name = None
    chunks: list[str] = []
    for line in text.splitlines():
        if line.startswith(">"):
            if name is not None:
                out[name] = "".join(chunks)
            name = line[1:].rstrip()
            chunks = []
        elif line:
            chunks.append(line.strip())
    if name is not None:
        out[name] = "".join(chunks)
    return out


def read_fasta_list(path_or_file) -> list[tuple[str, str]]:
    """Like read_fasta but preserves duplicates and file order as a list."""
    if hasattr(path_or_file, "read"):
        text = path_or_file.read()
    else:
        with open(path_or_file, "r") as fh:
            text = fh.read()
    out: list[tuple[str, str]] = []
    name = None
    chunks: list[str] = []
    for line in text.splitlines():
        if line.startswith(">"):
            if name is not None:
                out.append((name, "".join(chunks)))
            name = line[1:].rstrip()
            chunks = []
        elif line:
            chunks.append(line.strip())
    if name is not None:
        out.append((name, "".join(chunks)))
    return out


def write_fasta_record(fh, header: str, sequence: str,
                       line_width: int = 0) -> None:
    """Write one FASTA record.  ``line_width=0`` (default) emits the
    sequence as a single line — the byte format the refbuild shim pins and
    every reader accepts.  A positive width wraps sequence lines at that
    many characters, like sonLib's fastaWrite (the reference's emitter,
    impl/fasta_extract.c:35-51, impl/fasta_merge.c:47-84); faffy commands
    expose it as --lineWidth."""
    fh.write(">")
    fh.write(header)
    fh.write("\n")
    if line_width > 0:
        for i in range(0, len(sequence), line_width):
            fh.write(sequence[i: i + line_width])
            fh.write("\n")
        if not sequence:
            fh.write("\n")
    else:
        fh.write(sequence)
        fh.write("\n")


class SequenceLineWriter:
    """Incremental sequence-line writer with a column carry, for emitters
    that produce one logical sequence across several write calls (faffy
    merge's overlap-split pieces).  width=0 reproduces the historical
    one-line-per-piece output exactly."""

    def __init__(self, fh, width: int = 0):
        self.fh = fh
        self.width = width
        self.col = 0

    def piece(self, s: str) -> None:
        if self.width <= 0:
            self.fh.write(s)
            self.fh.write("\n")
            return
        w = self.width
        while s:
            room = w - self.col
            self.fh.write(s[:room])
            if len(s) >= room:
                self.fh.write("\n")
                self.col = 0
            else:
                self.col += len(s)
            s = s[room:]

    def end(self) -> None:
        """Finish the current sequence (close a partial wrapped line)."""
        if self.width > 0 and self.col:
            self.fh.write("\n")
            self.col = 0


def load_sequences(paths: list[str]) -> dict[str, str]:
    """Load multiple FASTA files into one name->sequence map (later files win
    on duplicate names, mirroring repeated stHash inserts)."""
    seqs: dict[str, str] = {}
    for p in paths:
        seqs.update(read_fasta(p))
    return seqs


# -------------------------------------------------------------- header codec

def encode_header(name: str, length: int, start: int) -> str:
    """name -> ``name|length|start`` (fasta_chunk header encoding,
    impl/fasta_chunk.c:81)."""
    return f"{name}|{length}|{start}"


@dataclass
class Interval:
    name: str
    start: int
    end: int = 0
    length: int = 0


def _sscanf_i64(s: str) -> int:
    """sscanf("%" PRIi64) semantics: skip leading whitespace, optional
    sign, parse the LEADING digit run, ignore trailing junk — the
    reference accepts "12x" as 12 (decode_fasta_header, impl/paf.c:719-725
    asserts only that one item matched)."""
    import re
    m = re.match(r"\s*[+-]?\d+", s)
    if m is None:
        raise ValueError(f"no leading integer in {s!r}")
    return int(m.group())


def decode_header(header: str) -> Interval:
    """``name|length|start`` -> Interval(name, start, length).

    Pops the last two '|' fields as start then length; anything before is
    rejoined with '|' as the name (decode_fasta_header, impl/paf.c:716-731).
    Field values parse with sscanf leading-integer semantics.
    """
    parts = header.split("|")
    if len(parts) < 3:
        raise ValueError(f"fasta header lacks |length|start provenance fields: {header!r}")
    start = _sscanf_i64(parts[-1])
    length = _sscanf_i64(parts[-2])
    return Interval(name="|".join(parts[:-2]), start=start, length=length)


# -------------------------------------------------- device-side byte packing

def seq_to_bytes(seq: str) -> np.ndarray:
    """Sequence string -> uint8 array (ASCII) for device-resident FASTA."""
    return np.frombuffer(seq.encode("latin-1"), dtype=np.uint8)


def fasta_pool_from_bytes(datas: list[bytes]):
    """(pool: uint8 array, index {name: (offset, length)}) built directly
    from FASTA file bytes in two native passes (native.fasta_pack_bytes) —
    no per-line Python string work (the str path measured ~3.7 s for a
    134 MB chromosome: splitlines + per-line join + re-encode).

    Returns None without a native toolchain — caller falls back to
    read_fasta + pack_sequences.  Duplicate names keep the LAST occurrence
    in the index, matching dict-overwrite semantics (both copies' bytes
    stay in the pool; only the index entry is replaced).
    """
    from paffy_tpu import native
    parts: list[np.ndarray] = []
    index: dict[str, tuple[int, int]] = {}
    pos = 0
    for data in datas:
        res = native.fasta_pack_bytes(data)
        if res is None:
            return None
        pool, records = res
        parts.append(pool)
        for name, off, ln in records:
            index[name] = (pos + off, ln)
        pos += len(pool)
    pool = (np.concatenate(parts) if len(parts) > 1
            else (parts[0] if parts else np.empty(0, dtype=np.uint8)))
    return pool, index


def pack_sequences(seqs: dict[str, str]) -> tuple[np.ndarray, dict[str, tuple[int, int]]]:
    """Concatenate sequences into one uint8 pool.

    Returns (pool, {name: (offset, length)}).  This is the device-resident
    FASTA layout: one flat HBM array, per-name offsets on the host.
    """
    total = sum(len(s) for s in seqs.values())
    pool = np.empty(total, dtype=np.uint8)
    index: dict[str, tuple[int, int]] = {}
    pos = 0
    for name, s in seqs.items():
        b = seq_to_bytes(s)
        pool[pos:pos + len(b)] = b
        index[name] = (pos, len(b))
        pos += len(b)
    return pool, index
