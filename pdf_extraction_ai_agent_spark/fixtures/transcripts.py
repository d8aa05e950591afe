"""Deterministic transcript-table generator (FIXTURES.md T1).

Produces the engine's sole large input: a table of multi-turn transcripts
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)`` whose ``text`` payloads are one of:

1. plain narrative claims   — mirrors /root/reference scripts/generate_samples.py:195-202
                              (6 sentence templates, blank-line separated)
2. labeled layout           — the 3 fixed variations (generate_samples.py:12-32)
3. HTML page                — narrative content wrapped in boilerplate-laden
                              HTML (nav / header / sidebar / footer / link
                              farms) for the boilerplate-strip stage
4. pseudo-PDF byte stream   — positioned text runs per the spec grammar,
                              exercising tokenization + reading-order sort
5. near-empty pseudo-PDF    — < 40 chars of text layer → needs_ocr flag
                              (extract_text.py:60-64)

Everything is seeded (reference precedent: generate_samples.py --seed) and
uses a FIXED base date so runs are reproducible on any day.
"""

from __future__ import annotations

import random
from datetime import date, datetime, timedelta

import pandas as pd

from ..spec import PDF_HEADER, PDF_LEADING

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

# Reference field pools (generate_samples.py:139-173), frozen base date for
# determinism instead of date.today().
_BASE_DATE = date(2026, 1, 1)
_BASE_TS = datetime(2026, 1, 1, 0, 0, 0)
_PREFIXES = ["ABC", "XYZ", "NW", "ZX9", "LMN", "QRS"]
_REASONS = [
    "Auto collision", "Water damage", "Fire damage", "Theft", "Hail storm",
    "Slip and fall", "Wind damage", "Liability claim", "Glass replacement",
    "Property vandalism",
]
_TEMPLATES = [
    "Claim# {claim_no} noted with amount ${amount:,.2f}. Reason: {reason}. Date of loss: {loss_date}.",
    "On {loss_date}, claim number {claim_no} was reported for {reason}; amount ${amount:,.2f}.",
    "Claim {claim_no}: {reason} — incurred ${amount:,.2f}; DoL {loss_date}.",
    "Reported DoL {loss_date}. Ref {claim_no}. Cause: {reason}. Indemnity ${amount:,.2f}.",
    "Reference {claim_no} — {reason}. Total ${amount:,.2f}. Loss date {loss_date}.",
    "For claim id {claim_no}, loss {loss_date}, reason {reason}, amount ${amount:,.2f}.",
]
_LABELED_VARIATIONS = [
    # generate_samples.py:12-32 — the 3 fixed sample layouts.
    [
        "Dipayans Claims Center",
        "Reference: Claim No: {claim_no}",
        "Claimant: {name}",
        "Reported Date: {loss_date}",
        "Notes: vehicle rear-ended at intersection.",
    ],
    [
        "INTERNAL MEMO",
        "ID 9981",
        "claim# {claim_no}",
        "Name - {name}",
        "Date {date_dmy}",
    ],
    [
        "Loss Summary",
        "The claim number is {claim_no} for insured {name}",
        "The accident occurred on {date_long}",
    ],
]
_NAMES = [
    "John A. Doe", "Jane Smith", "Mark O'Neil", "Alice Johnson",
    "Robert Brown-Lee", "Maria Garcia", "Wei Chen", "Priya Patel",
]
# LOB flavor sentences sprinkled into narratives so classification (C1/C2)
# has signal. Keyword tokens match spec.LOB_PATTERNS_C1 / LOB_HITS_C2.
_LOB_SENTENCES = {
    "AUTO": "Line: COMMERCIAL AUTO policy, VEHICLE COLLISION with TOW and RENTAL involved.",
    "GENERAL LIABILITY": "Line: COMMERCIAL GENERAL LIABILITY ( CGL ) PREMISES occurrence, AGGREGATE LIMIT applies.",
    "WC": "Line: WORKERS COMPENSATION claim, EMPLOYEE LOST TIME with INDEMNITY and MEDICAL ONLY review.",
}


def _claim_number(rng: random.Random) -> str:
    prefix = rng.choice(_PREFIXES)
    seq = rng.randint(10000, 99999)
    suffix = rng.choice(["", f"-{rng.randint(10, 99)}", f"/{rng.randint(100, 999)}"])
    return f"{prefix}-{seq}{suffix}"


def _loss_date(rng: random.Random) -> str:
    d = _BASE_DATE - timedelta(days=rng.randint(0, 365 * 5))
    return d.strftime("%m/%d/%Y")


def _claim_paragraph(rng: random.Random) -> str:
    return rng.choice(_TEMPLATES).format(
        claim_no=_claim_number(rng),
        amount=round(rng.uniform(100, 50000), 2),
        reason=rng.choice(_REASONS),
        loss_date=_loss_date(rng),
    )


def _plain_payload(rng: random.Random) -> str:
    n = rng.randint(1, 6)
    paras = [_claim_paragraph(rng) for _ in range(n)]
    if rng.random() < 0.5:
        lob = rng.choice(list(_LOB_SENTENCES))
        paras.insert(0, _LOB_SENTENCES[lob])
    return "\n\n".join(paras)


def _labeled_payload(rng: random.Random) -> str:
    variation = rng.choice(_LABELED_VARIATIONS)
    d = _BASE_DATE - timedelta(days=rng.randint(0, 365 * 5))
    fields = {
        "claim_no": _claim_number(rng),
        "name": rng.choice(_NAMES),
        "loss_date": d.strftime("%m/%d/%Y"),
        "date_dmy": d.strftime("%d-%m-%Y"),
        "date_long": d.strftime("%B {day}, %Y").format(day=d.day),
    }
    return "\n".join(line.format(**fields) for line in variation)


# --- HTML payload ----------------------------------------------------------

_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]


def _esc(s: str) -> str:
    for raw, ent in _ESCAPES:
        s = s.replace(raw, ent)
    return s


def _html_payload(rng: random.Random) -> str:
    """Boilerplate-laden page: one block element per line (spec contract)."""
    paras = [_claim_paragraph(rng) for _ in range(rng.randint(1, 5))]
    if rng.random() < 0.5:
        paras.insert(0, _LOB_SENTENCES[rng.choice(list(_LOB_SENTENCES))])
    nav_links = " ".join(
        f'<a href="/s{i}">{w}</a>'
        for i, w in enumerate(["Home", "Claims", "Policies", "Reports", "About us"][: rng.randint(3, 5)])
    )
    side_links = " ".join(
        f'<a href="/q{i}">Quick link number {i}</a>' for i in range(rng.randint(2, 4))
    )
    lines = [
        "<html>",
        "<head><title>Claims Portal</title></head>",
        "<body>",
        f"<nav>{nav_links}</nav>",
        "<header><h1>Portal</h1></header>",
        f'<div class="sidebar">{side_links}</div>',
    ]
    # Borderline blocks that the density/length rules must adjudicate:
    if rng.random() < 0.4:
        # link-heavy "related" block → dropped (link density > 0.35)
        lines.append(
            '<div class="related">See also <a href="/r1">prior loss runs</a> '
            'and <a href="/r2">carrier contact directory</a></div>'
        )
    if rng.random() < 0.4:
        # short teaser → dropped (len < 25)
        lines.append("<p>Updated daily.</p>")
    if rng.random() < 0.3:
        # long editorial note, one small link → KEPT (density below threshold)
        lines.append(
            "<p>These loss run figures were reviewed by the claims review &amp; audit team "
            'before publication; see the <a href="/m">methodology</a> page for details.</p>'
        )
    for p in paras:
        body = _esc(p)
        if rng.random() < 0.3:
            # inline markup inside content (stripped, not a block boundary)
            body = body.replace("Reason:", "<b>Reason:</b>", 1)
        lines.append(f"<p>{body}</p>")
    lines += [
        '<footer><a href="/tos">Terms of service</a> <a href="/priv">Privacy policy</a> (c) 2026</footer>',
        "</body>",
        "</html>",
    ]
    return "\n".join(lines)


# --- pseudo-PDF payload ----------------------------------------------------


def _wrap_words(text: str, width: int = 58) -> list[str]:
    words = text.split(" ")
    out, cur = [], words[0]
    for w in words[1:]:
        if len(cur) + 1 + len(w) <= width:
            cur += " " + w
        else:
            out.append(cur)
            cur = w
    out.append(cur)
    return out


def _pdf_payload(rng: random.Random, near_empty: bool = False) -> str:
    """Deterministic content stream; runs are shuffled within each page so
    the reading-order sort is load-bearing."""
    out = [PDF_HEADER]
    if near_empty:
        out.append("%%PAGE 1")
        # a stray stamp, under the 40-char OCR threshold
        out.append(f"BT 72.0 720.0 Td ({rng.choice(['scanned', 'img-only', ''])}) Tj ET")
        return "\n".join(out)

    n_pages = rng.randint(1, 3)
    for page in range(1, n_pages + 1):
        runs: list[tuple[float, float, str]] = []  # (x, y, text)
        y = 720.0
        for _ in range(rng.randint(1, 4)):  # claims on this page
            para = _claim_paragraph(rng)
            for seg in _wrap_words(para):
                jitter = rng.uniform(-0.8, 0.8)
                if len(seg) > 30 and rng.random() < 0.5:
                    # split the visual line into two runs with distinct x
                    cut = seg.rfind(" ", 0, len(seg) // 2)
                    cut = cut if cut > 0 else len(seg) // 2
                    left, right = seg[:cut], seg[cut + 1 :]
                    runs.append((72.0, y + jitter, left))
                    runs.append((72.0 + 6.0 * (cut + 1), y + rng.uniform(-0.8, 0.8), right))
                else:
                    runs.append((72.0, y + jitter, seg))
                y -= PDF_LEADING
            y -= PDF_LEADING * 2  # paragraph gap (>= PDF_PARA_GAP)
        rng.shuffle(runs)  # emit out of reading order
        out.append(f"%%PAGE {page}")
        for x, yy, t in runs:
            out.append(f"BT {x:.1f} {yy:.1f} Td ({t}) Tj ET")
    return "\n".join(out)


# --- real-PDF payload (vendored minipdf bytes, latin-1 in the text col) -----


def _real_pdf_payload(rng: random.Random, near_empty: bool = False) -> str:
    """Real PDF 1.4 bytes (fixtures/minipdf.py) carrying the same claim
    paragraphs — exercises the dependency-free tokenizer rung of
    extract_real_pdf_text end-to-end on genuine PDF structure (objects,
    page tree, xref; optionally FlateDecode + TJ arrays).

    Half the pages are emitted as POSITIONED items in SHUFFLED stream
    order (with ≥PDF_PARA_GAP paragraph gaps), so the reading-order
    assembly (y-cluster/x-sort, blank-line paragraphs) is load-bearing on
    real bytes exactly as it is for the pseudo-PDF payloads; the other
    half stay sequential Td-advance text blocks (the common generator
    idiom, exercising relative line-origin accumulation).

    The CARRIER mixes all the tokenizer's real-PDF shapes (round-5
    ROADMAP 6 — the golden per-turn-equality corpus soaks the whole
    matrix end-to-end through the batch kernel): classic xref (~35%),
    TAGGED classic files (~15% — BDC/EMC marked content + structure
    tree; extract_turn reads them GEOMETRICALLY, so the marked-content
    ops must be transparent to both positioned walks), PDF 1.5 ObjStm +
    xref streams (~15%), standard-handler encryption (~15%, RC4 V1/R2 /
    V2/R3, AESV2 V4/R4 and AES-256 V5/R6), CID-keyed Type0 fonts with
    ToUnicode CMaps (~10%), and simple-font /Differences remaps (~5%) /
    Type3 user-defined fonts (~5%) — the remapped-show carriers use
    text-block pages only (no positioned-items mode)."""
    from .minipdf import (
        write_cid_pdf,
        write_differences_pdf,
        write_encrypted_pdf,
        write_minimal_pdf,
        write_objstm_pdf,
        write_tagged_pdf,
        write_type3_pdf,
    )

    carrier = rng.random()  # drawn FIRST so page-shape draws stay aligned
    if near_empty:
        pages = [rng.choice(["scanned", "img-only", ""])]
    elif carrier >= 0.8:
        # CID / Differences carriers: sequential text blocks only
        pages = []
        for _ in range(rng.randint(1, 3)):
            paras = [
                _wrap_words(_claim_paragraph(rng))
                for _ in range(rng.randint(1, 3))
            ]
            body = "\n\n".join("\n".join(p) for p in paras)
            pages.append(body.encode("latin-1", errors="replace").decode("latin-1"))
    else:
        # minipdf writes latin-1 literal strings (no font-encoding tables by
        # design) — transliterate anything outside it, like a Type1-only
        # generator would
        pages = []
        for _ in range(rng.randint(1, 3)):
            paras = [
                _wrap_words(_claim_paragraph(rng))
                for _ in range(rng.randint(1, 3))
            ]
            if rng.random() < 0.5:
                # blank line between paragraphs → an empty-text run at its
                # own y → assembly preserves it (X1 record split works)
                body = "\n\n".join("\n".join(p) for p in paras)
                pages.append(body.encode("latin-1", errors="replace").decode("latin-1"))
            else:
                items = []
                y = 720.0
                for para in paras:
                    for seg in para:
                        seg = seg.encode("latin-1", errors="replace").decode("latin-1")
                        items.append(("text", 72 + rng.randint(0, 9), y, seg))
                        y -= PDF_LEADING
                    y -= PDF_LEADING * 2  # ≥ PDF_PARA_GAP → blank line
                rng.shuffle(items)  # emit out of reading order
                pages.append(items)
    if carrier >= 0.95 and not near_empty:
        data = write_differences_pdf(
            pages,
            compress=rng.random() < 0.5,
            encoding_ref=rng.random() < 0.5,
        )
    elif carrier >= 0.9 and not near_empty:
        data = write_type3_pdf(
            pages,
            compress=rng.random() < 0.5,
            charprocs_ref=rng.random() < 0.5,
        )
    elif carrier >= 0.8 and not near_empty:
        data = write_cid_pdf(
            pages,
            compress=rng.random() < 0.5,
            tj_arrays=rng.random() < 0.5,
            array_ranges=rng.random() < 0.5,
        )
    elif carrier >= 0.65:
        rev = rng.choice([2, 3, 4, 6])
        data = write_encrypted_pdf(
            pages,
            # R6's Algorithm 2.B is deliberately expensive: a FIXED owner
            # password keeps the memoized hash set small per process
            owner_pwd=b"own6" if rev == 6 else b"own-%d" % rng.randint(0, 9),
            revision=rev,
        )
    elif carrier >= 0.5:
        data = write_objstm_pdf(pages, compress=rng.random() < 0.5)
    elif carrier >= 0.35:
        # tagged classic file: every line becomes a marked-content
        # paragraph; string pages synthesize positions (blank line →
        # ≥PDF_PARA_GAP y gap), positioned pages reuse their items. The
        # structure tree records the PRE-SORT emission order; geometric
        # extraction (what extract_turn does) is order-independent.
        tagged_pages = []
        for page in pages:
            if isinstance(page, str):
                t_items, y = [], 720.0
                for line in page.split("\n"):
                    if not line:
                        y -= PDF_LEADING * 2
                        continue
                    t_items.append((72.0 + rng.randint(0, 9), y, line))
                    y -= PDF_LEADING
                tagged_pages.append(t_items or [(72.0, 720.0, page)])
            else:
                tagged_pages.append([(x, y, s) for _tag, x, y, s in page])
        data = write_tagged_pdf(
            tagged_pages,
            compress=rng.random() < 0.5,
            artifact="Page 1" if rng.random() < 0.5 else None,
            nest_sections=rng.random() < 0.3,
            mcr_kids=rng.random() < 0.3,
        )
    else:
        data = write_minimal_pdf(
            pages, compress=rng.random() < 0.5, tj_arrays=rng.random() < 0.5,
            # TL/quote-show line-advance idiom on a share of text-block
            # pages (positioned-items pages ignore the flag)
            leading=rng.random() < 0.4,
        )
    return data.decode("latin-1")


# --- table assembly --------------------------------------------------------

_ROLES = ["user", "assistant", "tool"]
_KIND_WEIGHTS = [
    ("plain", 0.40), ("labeled", 0.15), ("html", 0.20),
    ("pdf", 0.18), ("pdf_empty", 0.07),
]
# opt-in mix with real-PDF byte payloads (golden suite; the bench corpus
# keeps the original mix so round-over-round throughput stays comparable)
_KIND_WEIGHTS_REAL_PDF = [
    ("plain", 0.34), ("labeled", 0.13), ("html", 0.18),
    ("pdf", 0.14), ("pdf_empty", 0.06), ("pdf_real", 0.11), ("pdf_real_empty", 0.04),
]


def _pick_kind(rng: random.Random, include_real_pdf: bool = False) -> str:
    r = rng.random()
    acc = 0.0
    for kind, w in (_KIND_WEIGHTS_REAL_PDF if include_real_pdf else _KIND_WEIGHTS):
        acc += w
        if r < acc:
            return kind
    return "plain"


def conv_rows(i: int, rng: random.Random, skew: bool, skew_factor: int,
              include_real_pdf: bool = False) -> list[dict]:
    """All turns of conversation ``i`` from an already-seeded rng."""
    conv_id = f"conv-{i:08d}"
    r = rng.random()
    if skew and i == 0:
        n_turns = 30 * skew_factor
    elif r < 0.70:
        n_turns = rng.randint(1, 5)
    elif r < 0.95:
        n_turns = rng.randint(6, 20)
    else:
        n_turns = rng.randint(21, 60)
    rows: list[dict] = []
    turn_idx = 0
    for t in range(n_turns):
        kind = _pick_kind(rng, include_real_pdf)
        if kind == "plain":
            text, tool = _plain_payload(rng), ""
        elif kind == "labeled":
            text, tool = _labeled_payload(rng), ""
        elif kind == "html":
            text, tool = _html_payload(rng), "html_paste"
        elif kind == "pdf":
            text, tool = _pdf_payload(rng), "pdf_upload"
        elif kind == "pdf_real":
            text, tool = _real_pdf_payload(rng), "pdf_upload"
        elif kind == "pdf_real_empty":
            text, tool = _real_pdf_payload(rng, near_empty=True), "pdf_upload"
        else:
            text, tool = _pdf_payload(rng, near_empty=True), "pdf_upload"
        ts = _BASE_TS + timedelta(minutes=i * 1000 + t, seconds=rng.randint(0, 30))
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": turn_idx,
                "role": _ROLES[t % 3],
                "text": text,
                "tool": tool,
                "ts": ts,
            }
        )
        # occasional duplicate turn_idx with a later ts → exercises the
        # (turn_idx, ts) tiebreak of the stable-ordering window (W1)
        if rng.random() >= 0.03:
            turn_idx += 1
    return rows


def generate_transcripts(
    n_convs: int = 40,
    seed: int = 42,
    skew: bool = True,
    skew_factor: int = 20,
    include_real_pdf: bool = False,
) -> pd.DataFrame:
    """Generate the T1 transcripts table as a pandas DataFrame.

    Conversation lengths follow a short/medium/long mix; when ``skew`` is on,
    conversation 0 is an extreme outlier (``skew_factor`` × the long tail) —
    the skew fixture mandated by FIXTURES.md T1.
    """
    rng = random.Random(seed)
    rows: list[dict] = []
    for i in range(n_convs):
        rows.extend(conv_rows(i, rng, skew, skew_factor, include_real_pdf))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def distributed_transcripts(spark, n_convs: int, seed: int = 123,
                            skew: bool = True, skew_factor: int = 20,
                            partitions: int | None = None):
    """Cluster-scale generator: conversations are seeded INDEPENDENTLY
    (rng per conv keyed by (seed, conv index)), so generation parallelizes
    over any partitioning while staying deterministic. Used to build large
    bench corpora; the sequential generator above stays the pytest fixture.
    """
    import pandas as pd  # noqa: F811

    parts = partitions or spark.sparkContext.defaultParallelism * 2
    ids = spark.range(0, n_convs, 1, parts)

    def kernel(batches):
        for pdf in batches:
            rows: list[dict] = []
            for i in pdf["id"]:
                rng = random.Random(seed * 1_000_003 + int(i))
                rows.extend(conv_rows(int(i), rng, skew, skew_factor))
            out = pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )
            yield out

    return ids.mapInPandas(kernel, schema=TRANSCRIPT_SCHEMA)


def transcripts_spark_df(spark, n_convs: int = 40, seed: int = 42, **kw):
    """Transcripts as a Spark DataFrame with the T1 schema."""
    pdf = generate_transcripts(n_convs=n_convs, seed=seed, **kw)
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
