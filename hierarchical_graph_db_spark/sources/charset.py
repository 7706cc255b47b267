"""Minimal charset guesser for the email decode chain.

The reference delegates this stage to chardet (``app/common/utils.py:6-14``:
``chardet.detect`` → decode with ``errors='ignore'``). This container has no
chardet, so the round-2 verdict asked for a vendored byte-distribution
guesser covering the charsets where a latin-1-only fallback visibly diverges
on real mail: the Cyrillic single-byte family (koi8-r, windows-1251) and
Shift-JIS. The approach below re-derives the public Mozilla
universal-charset-detection ideas (structural probers for multi-byte codecs,
letter-frequency scoring for single-byte codecs); nothing is copied from
chardet — only its *verdicts* on well-formed text are the parity target
(pinned in tests/test_maildir_ingest.py).

Detection ladder (first confident verdict wins):

1. strict UTF-8 probe — valid UTF-8 (incl. pure ASCII) is UTF-8; random
   8-bit single-byte text is astronomically unlikely to pass.
2. Cyrillic frequency scoring — decode under each Cyrillic candidate and
   score how much the result looks like Russian (share of high bytes that
   map to Cyrillic letters × how well those letters match the Russian
   letter-frequency top set). Needs a high density of 8-bit bytes, so
   accented western text (mostly ASCII + a few accents) never trips it.
3. Shift-JIS structural probe — lead/trail byte ranges must parse end to
   end AND the decode must actually yield CJK text. Runs after the
   Cyrillic check because dense 0xC0-0xFF Cyrillic text can be
   structurally valid Shift-JIS, while Japanese text scores ~0 on step 2.
4. otherwise ``None`` → caller falls back (utf-8 → latin-1), same terminal
   behavior as the reference chain when chardet returns nothing usable.
"""

from __future__ import annotations

# Most frequent Russian letters (lowercase), ~top-16 by corpus frequency —
# public linguistic data, the same signal chardet's SBCS models encode.
_RU_COMMON = set("оеаинтсрвлкмдпуя")
_CYRILLIC_CANDIDATES = ("koi8-r", "windows-1251")


def _high_bytes(data: bytes) -> int:
    return sum(1 for b in data if b >= 0x80)


def _cyrillic_score(data: bytes, codec: str) -> float:
    """How strongly ``data`` reads as Russian under ``codec`` ∈ [0, 1]."""
    text = data.decode(codec, errors="ignore")
    high = [c for c in text if ord(c) > 0x7F]
    if not high:
        return 0.0
    cyr = [c for c in high if "Ѐ" <= c <= "ӿ"]
    if not cyr:
        return 0.0
    coverage = len(cyr) / len(high)
    common = sum(1 for c in cyr if c.lower() in _RU_COMMON) / len(cyr)
    # Both Cyrillic codecs map most high bytes to *some* Cyrillic letter, so
    # coverage alone cannot separate koi8-r from windows-1251 — the
    # frequency profile of the mapped letters does.
    return coverage * (0.3 + 0.7 * common)


def _shift_jis_plausible(data: bytes) -> bool:
    """Structural Shift-JIS scan: every byte must fit the lead/trail
    grammar, and at least one double-byte (kanji/kana) pair must occur."""
    i, pairs = 0, 0
    n = len(data)
    while i < n:
        b = data[i]
        if b <= 0x7F or 0xA1 <= b <= 0xDF:  # ASCII / half-width katakana
            i += 1
            continue
        if 0x81 <= b <= 0x9F or 0xE0 <= b <= 0xFC:  # lead byte
            if i + 1 >= n:
                return False
            t = data[i + 1]
            if not (0x40 <= t <= 0x7E or 0x80 <= t <= 0xFC):
                return False
            pairs += 1
            i += 2
            continue
        return False  # 0x80, 0xA0, 0xFD-0xFF: never valid
    if pairs == 0:
        return False
    try:
        decoded = data.decode("shift_jis")
    except UnicodeDecodeError:
        return False
    cjk = sum(1 for c in decoded if ord(c) >= 0x3000)
    return cjk >= max(1, pairs // 2)


def detect(data: bytes) -> str | None:
    """Best-guess codec name for ``data``, or None when nothing is
    confident (caller then walks the reference's utf-8 → latin-1 chain)."""
    if not data:
        return None
    try:
        data.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        pass
    # Single-byte Cyrillic needs *dense* 8-bit text: Russian prose is
    # mostly letters = mostly high bytes, while accented western text is
    # mostly ASCII. The density gate keeps latin-1 mail out.
    visible = sum(1 for b in data if b not in (0x20, 0x09, 0x0A, 0x0D))
    if visible and _high_bytes(data) / visible >= 0.4:
        scores = {c: _cyrillic_score(data, c) for c in _CYRILLIC_CANDIDATES}
        best = max(scores, key=scores.get)
        if scores[best] >= 0.6:
            return best
    if _shift_jis_plausible(data):
        return "shift_jis"
    return None
