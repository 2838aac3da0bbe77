"""ZIP and TAR archive scanning (REAL structural parse) + builders.

Source-code and document corpora ship as .zip / .tar archives (GitHub
exports, arXiv bulk data, Project Gutenberg dumps); the pass a 100-TB
corpus runs over an archive column is the same no-decode structural
audit as the media scan tier (containers.py): entry inventory, sizes,
methods, integrity fields — never payload extraction. Both layouts are
pure public structure: the ZIP end-of-central-directory + central
directory records (PKWARE APPNOTE.TXT) and the POSIX ustar 512-byte
header blocks with their octal fields and space-substituted checksum.

Hostile-input contract (imaging/jpeg/pdf/av/mpeg/warc/containers):
every failure raises ImageError (ValueError/IndexError/struct.error
wrapped at the public functions); entry counts and declared sizes are
validated against the buffer BEFORE allocation. STORED zip entries'
CRC-32 is verified (no decompression involved); DEFLATE payloads are
inventoried, never inflated.

Reference parity: the reference routes binary attachments by sniffed
file type and skips non-HTML (HtmlFetcher.java:206-327, EP2); this is
the same gate deepened for archive columns, per SURVEY §2.1/§2.5.
"""

from __future__ import annotations

import struct
import zlib

from .imaging import ImageError

MAX_ARCHIVE_ENTRIES = 1 << 16
_EOCD_SIG = b"PK\x05\x06"
_CDIR_SIG = b"PK\x01\x02"
_LOCAL_SIG = b"PK\x03\x04"


def zip_info(data: bytes) -> dict:
    """Structural ZIP inventory via the end-of-central-directory record
    and the central directory: entry count, per-method tallies,
    compressed/uncompressed byte totals, largest entry, and CRC-32
    verification of every STORED entry (byte-identity, no inflation).
    ZIP64 archives raise (declared unsupported — the 4-byte classic
    layout covers the long tail of real corpus archives)."""
    try:
        if len(data) < 22 or data[:4] not in (_LOCAL_SIG, _EOCD_SIG):
            raise ImageError("not a ZIP (no local/EOCD signature)")
        # EOCD: scan backward over the (bounded) trailing comment. A
        # comment may itself CONTAIN the EOCD signature bytes, so each
        # rfind candidate is validated (comment length reaches exactly
        # end-of-file, central directory signature at cd_off) and the
        # scan continues backward on mismatch — a bare rfind would
        # reject valid archives on the spurious later match.
        lo = max(0, len(data) - 22 - 0xFFFF)
        at = data.rfind(_EOCD_SIG, lo)
        while at >= 0:
            if at + 22 <= len(data):
                clen = struct.unpack("<H", data[at + 20:at + 22])[0]
                cdo = struct.unpack("<I", data[at + 16:at + 20])[0]
                if (at + 22 + clen == len(data)
                        and (cdo == 0xFFFFFFFF     # ZIP64: reject later
                             or data[cdo:cdo + 4] == _CDIR_SIG
                             # empty archive: cd_off points at the EOCD
                             or (cdo == at and struct.unpack(
                                 "<H", data[at + 10:at + 12])[0] == 0))):
                    break
            at = data.rfind(_EOCD_SIG, lo, at)
        if at < 0:
            raise ImageError("ZIP without end-of-central-directory")
        (n_disk, cd_size, cd_off) = struct.unpack(
            "<H I I", data[at + 10:at + 20])
        if n_disk == 0xFFFF or cd_off == 0xFFFFFFFF:
            raise ImageError("ZIP64 not supported")
        if n_disk > MAX_ARCHIVE_ENTRIES:
            raise ImageError("ZIP entry count exceeds cap")
        if cd_off + cd_size > len(data):
            raise ImageError("ZIP central directory out of range")
        pos = cd_off
        n = 0
        comp = unc = 0
        n_stored = n_deflate = n_other = 0
        max_entry = 0
        crc_ok = True
        while n < n_disk:
            if data[pos:pos + 4] != _CDIR_SIG:
                raise ImageError("bad ZIP central-directory signature")
            if pos + 46 > len(data):
                raise ImageError("truncated ZIP central-directory entry")
            (method, crc, csize, usize, nlen, elen, clen) = \
                struct.unpack("<H 4x I I I H H H",
                              data[pos + 10:pos + 34])
            off = struct.unpack("<I", data[pos + 42:pos + 46])[0]
            if 0xFFFFFFFF in (csize, usize, off):
                raise ImageError("ZIP64 not supported")
            comp += csize
            unc += usize
            max_entry = max(max_entry, usize)
            if method == 0:
                n_stored += 1
                if csize != usize:
                    raise ImageError("stored ZIP entry size mismatch")
                # local header: fixed 30 bytes + its own name/extra
                if off + 30 > len(data):
                    raise ImageError("ZIP local header out of range")
                if data[off:off + 4] != _LOCAL_SIG:
                    raise ImageError("bad ZIP local-header signature")
                lnlen, lelen = struct.unpack(
                    "<H H", data[off + 26:off + 30])
                body = off + 30 + lnlen + lelen
                if body + csize > len(data):
                    raise ImageError("ZIP stored payload out of range")
                if zlib.crc32(data[body:body + csize]) != crc:
                    crc_ok = False
            elif method == 8:
                n_deflate += 1
            else:
                n_other += 1
            pos += 46 + nlen + elen + clen
            n += 1
            if n > MAX_ARCHIVE_ENTRIES:
                raise ImageError("ZIP entry count exceeds cap")
        return {"n_entries": n, "compressed_bytes": comp,
                "uncompressed_bytes": unc, "max_entry_bytes": max_entry,
                "n_stored": n_stored, "n_deflate": n_deflate,
                "n_other": n_other, "stored_crc_ok": crc_ok}
    except ImageError:
        raise
    except (ValueError, IndexError, struct.error, OverflowError) as e:
        raise ImageError(f"malformed ZIP: {type(e).__name__}: {e}") \
            from None


def build_zip(entries: list[tuple[str, bytes]],
              deflate: bool = False) -> bytes:
    """Classic (non-ZIP64) archive writer: local headers + payloads,
    central directory, EOCD; real CRC-32s; STORED by default (byte-
    deterministic), DEFLATE optional."""
    locals_ = bytearray()
    central = bytearray()
    for name, payload in entries:
        nb = name.encode("utf-8")
        crc = zlib.crc32(payload)
        if deflate:
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            blob = c.compress(payload) + c.flush()
            method = 8
        else:
            blob = payload
            method = 0
        off = len(locals_)
        fixed = struct.pack("<HHHHH I I I HH", 20, 0, method, 0, 0,
                            crc, len(blob), len(payload), len(nb), 0)
        locals_ += _LOCAL_SIG + fixed + nb + blob
        central += (_CDIR_SIG + struct.pack("<H", 20) + fixed
                    + struct.pack("<HHH I I", 0, 0, 0, 0, off) + nb)
    eocd = (_EOCD_SIG + struct.pack("<HHHH I I H", 0, 0, len(entries),
                                    len(entries), len(central),
                                    len(locals_), 0))
    return bytes(locals_ + central + eocd)


def tar_info(data: bytes) -> dict:
    """POSIX ustar structural walk: 512-byte headers (octal size
    fields, space-substituted checksum VERIFIED per header), entries
    until the two-zero-block terminator; file/dir tallies and payload
    byte total. Payloads are skipped by size, never read as content."""
    try:
        if len(data) % 512:
            raise ImageError("TAR length not a multiple of 512")
        pos = 0
        n = n_files = n_dirs = 0
        total = 0
        while pos + 512 <= len(data):
            block = data[pos:pos + 512]
            if block == b"\x00" * 512:
                break
            raw_ck = block[148:156]
            try:
                want = int(raw_ck.rstrip(b"\x00 ").lstrip(b" ") or b"0",
                           8)
            except ValueError:
                raise ImageError("bad TAR checksum field") from None
            have = sum(block[:148]) + 8 * 32 + sum(block[156:])
            if want != have:
                raise ImageError("TAR header checksum mismatch")
            size_f = block[124:136].rstrip(b"\x00 ")
            size = int(size_f, 8) if size_f else 0
            if size < 0 or pos + 512 + size > len(data):
                raise ImageError("TAR entry size out of range")
            typ = block[156:157]
            if typ in (b"0", b"\x00", b"7"):
                n_files += 1
                total += size
            elif typ == b"5":
                n_dirs += 1
            n += 1
            if n > MAX_ARCHIVE_ENTRIES:
                raise ImageError("TAR entry count exceeds cap")
            pos += 512 + ((size + 511) // 512) * 512
        if n == 0:
            raise ImageError("no TAR entries")
        return {"n_entries": n, "n_files": n_files, "n_dirs": n_dirs,
                "total_file_bytes": total}
    except ImageError:
        raise
    except (ValueError, IndexError, struct.error, OverflowError) as e:
        raise ImageError(f"malformed TAR: {type(e).__name__}: {e}") \
            from None


def build_tar(entries: list[tuple[str, bytes | None]]) -> bytes:
    """ustar writer: a None payload emits a directory entry; correct
    octal fields, magic, and the space-substituted checksum; two zero
    blocks terminate."""
    out = bytearray()
    for name, payload in entries:
        is_dir = payload is None
        body = b"" if is_dir else payload
        hdr = bytearray(512)
        nb = name.encode("utf-8")
        if len(nb) > 100:
            raise ImageError("TAR name too long for ustar")
        hdr[0:len(nb)] = nb
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = (b"%011o" % len(body)) + b"\x00"
        hdr[136:148] = b"00000000000\x00"
        hdr[148:156] = b" " * 8
        hdr[156:157] = b"5" if is_dir else b"0"
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        ck = sum(hdr)
        hdr[148:156] = (b"%06o" % ck) + b"\x00 "
        out += hdr + body
        out += b"\x00" * ((512 - len(body) % 512) % 512)
    out += b"\x00" * 1024
    return bytes(out)
