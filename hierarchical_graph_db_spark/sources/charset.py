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

0. BOM probe (round-6 tranche) — UTF-32/16/8 byte-order marks, longest
   first (the UTF-32-LE BOM contains the UTF-16-LE BOM as a prefix), each
   confirmed by a strict decode; then BOM-less UTF-16 via the
   alternating-NUL pattern (mostly-ASCII wide text has a NUL every other
   byte — chardet's null-pattern signal).
1. ISO-2022-JP escape probe (round-5 "long tail") — JIS designator escape
   sequences + a strict decode. Runs BEFORE the UTF-8 probe because
   ISO-2022-JP is pure 7-bit and would otherwise be claimed as UTF-8
   (chardet's ESCCharSetProber has the same priority).
2. strict UTF-8 probe — valid UTF-8 (incl. pure ASCII) is UTF-8; random
   8-bit single-byte text is astronomically unlikely to pass.
3. East-Asian double-byte scoring (euc-kr / gb2312 / big5 from round 4,
   euc-jp from round 5; moved ahead of the single-byte arena in round 7) —
   strict decode under each candidate, then a coverage × common-character
   formula: the byte *structure* of the EUC family is shared (pairs
   ≥ 0xA1), so what separates Korean euc-kr from simplified-Chinese
   gb2312 from Japanese euc-jp is whether the decode lands on frequent
   Hangul syllables, frequent hanzi, or kana — exactly the signal
   chardet's language models encode. Probed first because its strict
   decode is a hard structural filter (wrong-family text raises), whereas
   the single-byte scorers below can only measure letter frequencies.
4. Single-byte frequency arena (round-7 tranche widened it) — decode
   under each candidate and score coverage of the target script block ×
   frequent-letter share: koi8-r / windows-1251 / koi8-u for Cyrillic
   (the East-Slavic union set lets Ukrainian's і count; koi8-u vs koi8-r
   is decided by the box-drawing-vs-letter reassignments), windows-1255
   for Hebrew, windows-1256 for Arabic. All five compete in one argmax —
   cross-script confusions clear the floor but never outscore the true
   codec. Needs a high density of 8-bit bytes, so accented western text
   (mostly ASCII + a few accents) never trips it.
5. Shift-JIS structural probe — lead/trail byte ranges must parse end to
   end AND the decode must actually yield CJK text. Runs after steps 3-4
   because dense Cyrillic/EUC text can be structurally valid Shift-JIS,
   while Japanese text scores ~0 on the preceding scorers.
6. otherwise ``None`` → caller falls back (utf-8 → latin-1), same terminal
   behavior as the reference chain when chardet returns nothing usable.
"""

from __future__ import annotations

# Most frequent Russian letters (lowercase), ~top-16 by corpus frequency —
# public linguistic data, the same signal chardet's SBCS models encode.
_RU_COMMON = set("оеаинтсрвлкмдпуя")
# Round-7 tranche: koi8-u differs from koi8-r only where box-drawing bytes
# were reassigned to Ukrainian і/ї/є/ґ — Russian text decodes identically
# under both (candidate order keeps the koi8-r verdict on ties, matching
# chardet), while Ukrainian koi8-u text loses Cyrillic coverage under the
# koi8-r decode (і → box-drawing). The frequency set is the East-Slavic
# union so Ukrainian's і (its 2nd most frequent letter) counts for it.
_SLAVIC_COMMON = _RU_COMMON | set("іїєґ")
_CYRILLIC_CANDIDATES = ("koi8-r", "windows-1251", "koi8-u")

# Most frequent Hangul syllables / hanzi / kana — public corpus-frequency
# data (top grammatical particles + pronouns dominate running text in each
# language, the same discrimination chardet's CJK language models use).
_KO_COMMON = set("이다는의에하고지를은가기한으로서사아요니시")
_ZH_SIMP_COMMON = set("的一是不了在人有我他这中大来上国个到说们为子和你地出道")
_ZH_TRAD_COMMON = set("的一是不了在人有我他這中大來上國個到說們為子和你地出道")
# Japanese running text is dominated by kana particles/inflections — a
# wrong-family decode landing on euc-jp yields kanji-ish noise with ~0 kana
# frequency, which is exactly chardet's EUCJPDistributionAnalysis signal.
_JA_COMMON = set("のにはをたがでてとしなれさるいうんかまっすこれそれん今日")


def _hangul(c: str) -> bool:
    return "가" <= c <= "힣"


def _ideograph(c: str) -> bool:
    return "一" <= c <= "鿿"


def _japanese(c: str) -> bool:
    # kana (incl. punctuation-adjacent prolonged mark) or kanji
    return "ぁ" <= c <= "ヿ" or _ideograph(c)


# (codec, script predicate, frequent-character set); euc-jp sits in the
# same EUC byte grammar as euc-kr/gb2312 — the round-5 "long tail" item —
# so the frequency term (kana density) is what separates it.
_DBCS_CANDIDATES = (
    ("euc-kr", _hangul, _KO_COMMON),
    ("gb2312", _ideograph, _ZH_SIMP_COMMON),
    ("big5", _ideograph, _ZH_TRAD_COMMON),
    ("euc-jp", _japanese, _JA_COMMON),
)

# ISO-2022-JP is 7-bit with explicit JIS designator escapes — detectable
# from the escape sequence alone (chardet's ESCCharSetProber does the
# same). Must be probed BEFORE the utf-8 check: pure 7-bit bytes are also
# trivially valid UTF-8.
_ISO2022_JP_MARKS = (b"\x1b$B", b"\x1b$@", b"\x1b(J")

# Byte-order marks, longest first: the UTF-32-LE BOM (ff fe 00 00) has the
# UTF-16-LE BOM as a prefix, so order is load-bearing (chardet's BOM check
# has the same ordering). utf-8-sig so the decode strips the BOM, matching
# chardet's UTF-8-SIG verdict.
_BOMS = (
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
    (b"\xef\xbb\xbf", "utf-8-sig"),
)


def _utf16_null_pattern(data: bytes) -> str | None:
    """BOM-less UTF-16 heuristic (chardet's null-pattern signal): mostly-
    ASCII text encoded as UTF-16 has a NUL in every other byte — even
    positions for BE, odd for LE. Requires even length, a dominant
    one-sided NUL pattern, and a strict decode."""
    if len(data) < 8 or len(data) % 2:
        return None
    even = sum(1 for b in data[0::2] if b == 0)
    odd = sum(1 for b in data[1::2] if b == 0)
    half = len(data) // 2
    for nulls, codec in ((even, "utf-16-be"), (odd, "utf-16-le")):
        other = odd if codec == "utf-16-be" else even
        if nulls >= 0.7 * half and other <= 0.1 * half:
            try:
                data.decode(codec)
                return codec
            except UnicodeDecodeError:
                return None
    return None


def _dbcs_score(data: bytes, codec: str, script, common: set[str]) -> float:
    """How strongly ``data`` reads as ``codec``'s language ∈ [0, 1]: a
    STRICT decode must succeed (the structural check — wrong-family byte
    grammars raise), then coverage (high chars landing in the target
    script) × frequent-character share. Cross-family confusions (Korean
    bytes decoded as gb2312 land on *valid but arbitrary* hanzi) pass the
    structure test yet score ≤ ~0.3 on the frequency term."""
    try:
        text = data.decode(codec)
    except (UnicodeDecodeError, LookupError):
        return 0.0
    high = [c for c in text if ord(c) > 0x7F]
    if not high:
        return 0.0
    hits = [c for c in high if script(c)]
    if len(hits) < 4:  # too little text for a frequency verdict
        return 0.0
    coverage = len(hits) / len(high)
    # CJK running text is frequency-flat next to alphabetic scripts: the
    # top-25 hanzi/syllables cover only ~15-30% of real text, while a
    # wrong-codec decode lands on them at chance level (<1%). Saturating
    # the term at 15% makes that gap decisive instead of marginal.
    freq = sum(1 for c in hits if c in common) / len(hits)
    return coverage * (0.2 + 0.8 * min(1.0, freq / 0.15))


def _high_bytes(data: bytes) -> int:
    return sum(1 for b in data if b >= 0x80)


def _cyrillic_score(data: bytes, codec: str) -> float:
    """How strongly ``data`` reads as Russian under ``codec`` ∈ [0, 1]."""
    text = data.decode(codec, errors="ignore")
    high = [c for c in text if ord(c) > 0x7F]
    if not high:
        return 0.0
    cyr = [c for c in high if "Ѐ" <= c <= "ӿ"]
    if len(cyr) < 4:  # too little text for a frequency verdict (a 3-byte
        return 0.0    # katakana run maps onto cp1251's І/і, for example)
    coverage = len(cyr) / len(high)
    common = sum(1 for c in cyr if c.lower() in _SLAVIC_COMMON) / len(cyr)
    # Both Cyrillic codecs map most high bytes to *some* Cyrillic letter, so
    # coverage alone cannot separate koi8-r from windows-1251 — the
    # frequency profile of the mapped letters does.
    return coverage * (0.3 + 0.7 * common)


# Round-7 tranche: Hebrew / Arabic single-byte Windows codepages. Same
# coverage × letter-frequency formula as the Cyrillic scorer, generalized
# over the target Unicode block; the strict decode doubles as a structural
# filter (both codepages leave bytes unmapped, so random 8-bit data and
# wrong-family text usually raise). Frequent-letter sets are public corpus
# data — the same signal chardet's Hebrew/Arabic SBCS models encode.
_HE_COMMON = set("יהולארתשמבענ")
_AR_COMMON = set("اليمونهربةتكعدس")
_SBCS_CANDIDATES = (
    ("windows-1255", "֐", "״", _HE_COMMON),
    ("windows-1256", "؀", "ۿ", _AR_COMMON),
)


def _sbcs_score(data: bytes, codec: str, lo: str, hi: str,
                common: set[str]) -> float:
    """How strongly ``data`` reads as ``codec``'s language ∈ [0, 1]: strict
    decode, then coverage of high chars inside the script's Unicode block ×
    frequent-letter share (chance hits land well under the 0.6 verdict
    threshold; true-codec prose lands ~0.7+)."""
    try:
        text = data.decode(codec)
    except (UnicodeDecodeError, LookupError):
        return 0.0
    high = [c for c in text if ord(c) > 0x7F]
    if not high:
        return 0.0
    hits = [c for c in high if lo <= c <= hi]
    if len(hits) < 4:
        return 0.0
    coverage = len(hits) / len(high)
    freq = sum(1 for c in hits if c in common) / len(hits)
    return coverage * (0.3 + 0.7 * freq)


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


# Windows-1252 vs latin-1 (round-6 tranche): byte-identical above 0x9F, so
# the ONLY separating signal is the C1 range 0x80-0x9F — typographic
# punctuation (smart quotes, dashes, ellipsis, euro) in cp1252, control
# characters in latin-1. chardet's verdict for western text containing any
# of these is Windows-1252; text without them is genuinely ambiguous and
# stays on the latin-1 fallback (same terminal behavior either way for
# bytes >= 0xA0). The five unmapped cp1252 bytes (0x81 8D 8F 90 9D) and
# any non-typographic C1 use disqualify.
_CP1252_TYPOGRAPHIC = frozenset(
    range(0x80, 0xA0)) - {0x81, 0x8D, 0x8F, 0x90, 0x9D}


def _cp1252_probable(data: bytes) -> bool:
    c1 = [b for b in data if 0x80 <= b <= 0x9F]
    if not c1 or any(b not in _CP1252_TYPOGRAPHIC for b in c1):
        return False
    # Western prose carries high bytes as isolated accents/punctuation;
    # single-byte Cyrillic (cp1251 keeps capitals in 0x80-0x9F) carries
    # them as whole-word RUNS. The run-length guard separates the cases
    # even when overall 8-bit density is similar.
    run = max_run = 0
    for b in data:
        run = run + 1 if b >= 0xA0 else 0
        max_run = max(max_run, run)
    if max_run > 3:
        return False
    try:
        data.decode("cp1252")
    except UnicodeDecodeError:
        return False
    return True


def detect(data: bytes) -> str | None:
    """Best-guess codec name for ``data``, or None when nothing is
    confident (caller then walks the reference's utf-8 → latin-1 chain)."""
    if not data:
        return None
    for bom, codec in _BOMS:
        if data.startswith(bom):
            try:
                data.decode(codec)
                return codec
            except (UnicodeDecodeError, LookupError):
                break  # BOM-shaped prefix on non-Unicode data: fall through
    wide = _utf16_null_pattern(data)
    if wide:
        return wide
    if any(m in data for m in _ISO2022_JP_MARKS):
        try:
            data.decode("iso-2022-jp")
            return "iso-2022-jp"
        except (UnicodeDecodeError, LookupError):
            pass  # stray ESC in non-JIS data: fall through the ladder
    try:
        data.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        pass
    # Double-byte East-Asian first (round-7 reorder): the strict-decode
    # structural filter gives it the crispest verdicts (true codec scores
    # >= ~0.87 on the parity corpus, wrong-family <= ~0.33), while the
    # single-byte scorers can only measure letter frequencies — dense EUC
    # text decoded as cp1251 lands on plausible-looking Cyrillic, so the
    # frequency arena must not get first claim.
    dbcs = {codec: _dbcs_score(data, codec, script, common)
            for codec, script, common in _DBCS_CANDIDATES}
    best = max(dbcs, key=dbcs.get)
    if dbcs[best] >= 0.5:
        return best
    # Single-byte codepages need *dense* 8-bit text: Cyrillic / Hebrew /
    # Arabic prose is mostly letters = mostly high bytes, while accented
    # western text is mostly ASCII. The density gate keeps latin-1 mail
    # out. All five candidates compete in ONE arena — cross-script
    # confusions (Hebrew bytes read as koi8-r Cyrillic) can clear the 0.6
    # bar, but the true codec's frequency profile always scores higher, so
    # the argmax decides. Candidate order breaks exact ties (Russian text
    # decodes identically under koi8-r and koi8-u → koi8-r, as chardet).
    visible = sum(1 for b in data if b not in (0x20, 0x09, 0x0A, 0x0D))
    if visible and _high_bytes(data) / visible >= 0.4:
        arena = {c: _cyrillic_score(data, c) for c in _CYRILLIC_CANDIDATES}
        for codec, lo, hi, common in _SBCS_CANDIDATES:
            arena[codec] = _sbcs_score(data, codec, lo, hi, common)
        best = max(arena, key=arena.get)
        if arena[best] >= 0.6:
            return best
    if _cp1252_probable(data):
        return "windows-1252"
    if _shift_jis_plausible(data):
        return "shift_jis"
    return None
