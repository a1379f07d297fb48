"""Document extraction stages: reference citations, dates, gazetteer
entities — the reference-parity operators behind M5/M6 and §2.9 dates.

- :class:`RefExtractor` mirrors the compiled-pattern reference library of
  ``common/document_parser/ref_utils.py:31-1228`` + ``lib/ref_list.py:10-86``:
  a dict of citation-type → compiled regex with exactly ONE capture group
  (the numeric part), a shared text preprocessor (unicode dash → "-",
  parentheses stripped, whitespace squashed), numeric range guards for
  Title (1–53) and CFR Title (1–50), and normalized "<Type> <num>" refs
  counted per document. The pattern set here is a representative public
  citation-format subset of the reference's 84; the contract (one group,
  guards, normalization) is identical.
- :class:`DateExtractor` mirrors ``lib/dates.py:9-162``: the four
  day-month-year / month-day-year long/short patterns, strptime-validated,
  merged into one per-doc date list.
- :class:`EntityExtractor` mirrors ``lib/entities.py:18-119`` +
  ``entities_utils.py:108-153``: a gazetteer with multi-word, OVERLAPPING
  terms and per-term types, matched longest-first with overlap removal
  (longer entities claim their spans; shorter terms only match what's
  left), per-doc mention counts and top-k entities. Matching runs as a
  masked replace chain — each term's occurrences are counted then blanked
  in strict (length desc, term asc) order — which is both vectorizable
  (one C-level pass per term over the whole batch) and exactly
  reproducible by a SQL oracle, unlike trie scan order.

All three are actor-pool stages: patterns/gazetteer compile once per
actor in ``__init__`` (ST1 pattern), batches stream through ``__call__``.
"""

from __future__ import annotations

import datetime
import re

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# References (M5)
# ---------------------------------------------------------------------------

def preprocess_text(text: str) -> str:
    """Unicode en-dash → '-', parentheses stripped, whitespace squashed
    (``ref_utils.py::preprocess_text`` semantics)."""
    text = text.replace("–", "-")
    text = re.sub(r"[()]", "", text)
    return " ".join(text.split())


# Shared number-shape vocabulary. Most citation families are "<head
# alternation> <number>"; the shapes below name the recurring number
# grammars so the table reads as (type, heads, shape) facts about the
# public citation formats rather than 1200 lines of literal regex
# (the reference spells each one out long-hand; same language, different
# factoring).
_DODNUM = r"(?:[A-Z]+-)?[0-9]{4}\. ?[0-9]{1,3} ?(?:-[A-Z]+)?E?"     # 1234.56, AB-1234.56-CD
_D4DOT = r"[0-9]{4}\.[0-9]{1,3}[A-Z]?"                              # 1234.56A
_DASH = lambda a, b: rf"[0-9]{{{a}}} ?- ?[0-9]{{{b}}}"              # digit-dash-digit
_PARTNUM = (r"(?:(?:Sub)?Part|Clauses?)? ?[0-9]{1,5}(?:[-\.][0-9]{1,5}){0,3}"
            r"|Appendix ?[A-Z]")                                     # FAR/DFARS part or appendix

# (type, head alternation, number shape) — builder wraps as
# \b(?:heads) ?(shape), IGNORECASE; exactly ONE capture group (the number),
# the ``ref_utils.py::make_dict`` contract.
_CITE_TABLE: tuple[tuple[str, str, str], ...] = (
    ("DoD", r"dod", _DODNUM),
    ("DoDD", r"dod ?directives?|dodd", _DODNUM),
    ("DoDI", r"dod ?instruction|dodi", _DODNUM),
    ("DoDM", r"dod ?manual|dodm",
     r"(?:[A-Z]+-)?[0-9]{4}\. ?[0-9]{1,3}(?: ?,* ?Volume ?[0-9]+| ?- ?V[0-9])?"),
    ("DTM", r"dtm ?-?|dt ?memorandum ?-?", r"[0-9]{2} ?- ?[0-9]{3}"),
    ("AI", r"administrative ?instruction|ai", r"[0-9]+"),
    ("ICD", r"intelligence ?community ?directive|icd", r"[0-9]{1,3}\b"),
    ("ICPG", r"icpg", r"(?:[A-Z]+-)?[0-9]{3}\. ?[0-9]{1,3} ?(?:-[A-Z]+)?E?"),
    ("ICPM", r"icpm", r"[0-9]{4}- ?[0-9]{3}- ?[0-9]"),
    ("CJCSI", r"cjcs ?i(?:nstruction)?|chairman of (?:the )?joint chiefs? of staff instruction",
     r"[A-Z]-[0-9]|[0-9]{1,6}\.(?:[0-9A-Z]{1,5}){1,2}"),
    ("CJCSM", r"cjcs ?manual|cjcsm", r"(?:[A-Z]+-)?[0-9]{4}\. ?[0-9]{1,3}[A-Z]?"),
    ("CJCS GDE", r"cjcs ?gde|cjcsg", r"(?:[A-Z]+-)?[0-9]{4} ?[A-Z]?"),
    ("CJCSN", r"cjcs ?notice|cjcsn", r"(?:[A-Z]+-)?[0-9]{4}(?:\. ?[0-9]{0,3}[A-Z]?)?"),
    ("JP", r"joint ?publication|j[ \.]?p[ \.]?", r"[0-9]{1,3}(?:[-\.][0-9]{1,3}){0,3}"),
    ("DCID", r"director ?of ?central ?intelligence ?directives|dcid", r"[0-9]/[0-9]{1,2}P?"),
    ("EO", r"executive ?order|eo|e\. ?o\. ?", r"[0-9]{5}"),
    ("AR", r"ar|army ?regulations?", r"[0-9]{1,3}(?: ?- ?[0-9]{1,3}){0,2}"),
    ("AGO", r"ago|army ?general ?orders?", r"(?:19|20)[0-9]{2} ?- ?[0-9]{2,3}"),
    ("ADP", r"adp|army ?doctrine ?publications?", r"1|[0-9]{1,2} ?- ?[0-9]{1,2}"),
    ("PAM", r"pam|da ?pam(?:phlets?)?", _DASH("1,3", "1,3") + r"(?: ?- ?[0-9]{1,3})?"),
    ("ATP", r"atp|army ?techniques ?publications?",
     r"[0-9] ?- ?[0-9]{1,2}(?:\.[0-9]{1,2}(?: ?- ?[0-9]{1,2})?)?"),
    ("ARMY", r"army ?dir|army ?directives?", r"20[0-9]{2} ?- ?[0-9]{2}(?: ?- ?[0-9]{1,2})?"),
    ("TC", r"tc|training ?circular",
     r"[0-9]{1,2} ?- ?(?:HEAT|[0-9]{1,3}(?: ?(?:\.|- ?[0-9]{1,3}(?: ?- ?[0-9])?A?)?))"),
    ("STP", r"stp|soldier ?training ?publication",
     r"[0-9]{1,2} ?- ?[A-Z0-9]{1,6}(?: ?- ?[A-Z]{2,4}(?: ?- ?[A-Z]{2})?)?"),
    ("TB", r"tb|technical ?bulletins?",
     r"ENG ?[0-9]{2,3}|[0-9]{3} ?- ?[0-9]{1,2}|MED ?[0-9]{1,3}(?:- ?[0-9]{1,2})?"
     r"|[0-9]{1,2} ?- ?[0-9]{3,4} ?(?:- ?(?:[0-9]{3} ?- ?[0-9]{2})|(?:[A-Z]{3})?)"),
    ("DA", r"da ?memo(?:randums?)?", _DASH("1,3", "1,3") + r"(?: ?- ?[0-9]{2})?"),
    ("FM", r"fm|field ?manual", r"(?:[0-9]{1,3}[-\.]){1,3}[0-9A-Z]{0,3}"),
    ("GTA", r"gta|graphic ?training ?aid", _DASH("2", "2") + r"(?: ?- ?[0-9]{3})?[A-Z]?"),
    ("HQDA", r"hqda ?policy ?notice", _DASH("1,3", "1")),
    ("CTA", r"cta|common ?table ?of ?allowances?", _DASH("1,2", "3")),
    ("ATTP", r"attp|army ?tactics,? ?techniques ?and ?procedures?",
     r"[0-9] ?- ?[0-9]{2} ?\. ?[0-9]{2}"),
    ("TM", r"tm|technical ?manuals?",
     r"[0-9]{1,2} ?- ?[A-Z0-9]{1,4}(?:\.[0-9]{2})?(?: ?- ?[A-Z0-9&]{1,4})*"),
    ("AFI", r"afi|air ?force ?instructions?", r"[0-9]{1,2} ?- ?[A-Z0-9-_]+"),
    ("CFETP", r"cfetp|career ?field ?education ?(?:and|&) ?training ?plan",
     r"[A-Z0-9]*[0-9][A-Z0-9-_]+"),
    ("AFMAN", r"afman|air ?force ?manual", r"[0-9]{2} ?- ?[A-Z0-9-_]+"),
    ("QTP", r"qtp|qualification ?training ?package",
     r"[0-9][0-9A-Z]{1,6}(?: ?- ?[0-9A-Z]{1,6}){0,2}"),
    ("AFPD", r"afpd|air ?force ?policy ?directive",
     r"1|[0-9]{2} ?- ?[0-9]{1,2}(?: ?- ?[A-Z])?"),
    ("AFTTP", r"afttp|air ?force ?tactics?,? ?techniques?,? ?(?:and|&)? ?procedures?",
     r"[0-9] ?- ?[0-9]{1,2}(?:\.[0-9]{1,2})?(?:V[0-9]|_[A-Z]{2})?"),
    ("AFVA", r"afva|air ?force ?visual ?aids?", _DASH("1,2", "1,4")),
    ("AFH", r"afh|air ?force ?handbook",
     r"1|[0-9]{1,2} ?- ?[0-9]{3,4}(?: ?I ?| ?V ?[0-9]{1,2}|(?: ?, ? ?Vol(?:ume)? ?[0-9]{1,2}))?"),
    ("HAFMD", r"hafmd|headquarters ?air ?force ?mission ?directive",
     r"[0-9] ?- ?[0-9]{1,2}(?: ?ADDENDUM ?[A-Z])?"),
    ("AFPAM", r"afpam|air ?force ?pamphlet", r"(?: ?I ?)?[0-9]{2} ?- ?[0-9]{3,4}(?: ?V ?[0-9])?"),
    ("AFMD", r"afmd|air ?force ?mission ?directive", r"[0-9]{1,2}"),
    ("AFM", r"afm|air ?force ?manual", _DASH("2", "2")),
    ("HOI", r"hoi|headquarters ?operating ?instruction", _DASH("2", "1,2")),
    ("AFJQS", r"afjqs|air ?force ?job ?qualification ?standard",
     r"[0-9][0-9A-Z]{4}(?: ?- ?[0-9])?"),
    ("AFJI", r"afji|air ?force ?joint ?instruction", _DASH("2", "3,4")),
    ("AFGM", r"afgm|air ?force ?guidance ?memorandum",
     r"[0-9]{4} ?- ?[0-9]{2} ?- ?[0-9]{2}(?:[0-9] ?- ?[0-9]{2})?"),
    ("DAFI", r"dafi|department ?of ?the ?air ?force ?instruction",
     r"[0-9]{2} ?- ?[0-9]{3,4}(?: ?V ?[0-9])?"),
    ("AF", r"af ?(?:form)?|air ?force ?(?:form)?", r"[0-9]{1,4}[A-Z]?"),
    ("SF", r"sf", r"[0-9]{2,4}(?: ?- ?[0-9])?[A-Z]?"),
    ("AFPM", r"afpm|air ?force ?policy ?memorandum", r"[0-9]{4} ?- ?[0-9]{2} ?- ?[0-9]{2}"),
    ("AFJMAN", r"afjman|air ?force ?joint ?manual", _DASH("2", "3")),
    ("JTA", r"jta|joint ?table ?of ?allowances?", _DASH("2", "1,3")),
    ("DAFPD", r"dafpd|department ?of ?the ?air ?force ?policy ?directive", _DASH("2", "1,2")),
    ("MCO", r"mco|marine ?corps ?orders?", r"[0-9]{4,5}[A-Z]?\.[0-9]{1,3}[A-Z]?"),
    ("MCO P", r"mco[ -]p[ -]?", r"[0-9]{2,6}[A-Z]?(?:\.[0-9]{1,3}[A-Z]?)\b"),
    ("MCBUL", r"mcbul|marine ?corps ?bulletin", r"[0-9]{4,5}"),
    ("NAVMC", r"navmc", r"[0-9]{4}(?:\.[0-9]{1,3}[A-Z]?| ?- ?[A-Z])?"),
    ("NAVMC DIR", r"navmc ?dir|navmc ?directive", r"[0-9]{4}.[0-9]{1,3}[A-Z]?"),
    ("MCRP", r"mcrp|marine ?corps ?reference ?publication",
     r"[0-9]{1,2} ?- ?[0-9]{1,2}[A-Z]?(?:\.[0-9]{1,2}[A-Z]?)?"),
    ("MCTP", r"mctp|marine ?corps ?tactical ?publication", r"[0-9]{1,2} ?- ?[0-9]{2}[A-Z]"),
    ("MCWP", r"mcwp|marine ?corps ?warfighting ?publication",
     r"(?:[0-9]{1,3}[-\.]){1,3}[0-9A-Z]{0,3}"),
    ("MCDP", r"mcdp|marine ?corps ?doctrinal ?publication", r"[0-9](?: ?- ?[0-9])?"),
    ("MCIP", r"mcip|marine ?corps ?interim ?publication",
     r"[0-9]{1,2} ?- ?[0-9]{2}(?:[A-Z]{1,2})?(?:\.?[0-9]{1,2}[A-Z]?)?"),
    ("FMFRP", r"fmfrp|fleet ?marine ?force ?reference ?publication",
     r"[0-9]{1,2} ?- ?[0-9]{1,3}(?: ?- ?I+)?"),
    ("FMFM", r"fmfm|fleet ?marine ?force ?manuals?", r"[0-9] ?- ?[0-9]{1,2}(?: ?- ?[0-9])?"),
    ("IRM", r"irm|information ?resource ?management", r"(?:- ?)?[0-9]{4} ?- ?[0-9]{2}[A-Z]?"),
    ("SECNAVINST", r"secnavinst|secnav ?instruction", r"[0-9]{4}\.[0-9]{1,2}[A-Z]?"),
    ("SECNAV", r"secnav", r"M ?- ?[0-9]{4}\.[0-9]{1,2}"),
    ("NAVSUP", r"navsup p(?:ub(?:lication)?)? ?-?", r"[0-9]{1,4}"),
    ("JAGINST", r"jaginst|jag ?instruction", r"[0-9]{4,5}(?:\.[0-9]{1,2}[A-Z]?)?"),
    ("OMBM", r"ombm?", r"(?:M-)?[0-9]{1,3}-[0-9]{1,3}\b"),
    ("OMBC", r"(?:omb|office ?of ?management ?and ?budget) ?c(?:ircular)? (?:No\.? ?)?",
     r"[A-Z]-[0-9]{1,5}"),
    ("CI", r"comdtinst", r"[0-9]{3,6}(?:\.[0-9]{1,4}[A-Z]?)?"),
    ("COMDTPUB", r"comdtpub", r"[A-Z]?[0-9]{2,6}(?:\.[0-9]{1,3}[A-Z]?)?"),
    ("CIM", r"comdtinst ?m", r"[0-9]{3,6}(?:\.[0-9]{1,4}[A-Z]?)?"),
    ("DCMS", r"(?:deputy ?commandant ?for ?mission ?support|dcms),? ?(?:contingency ?support ?plan,? ?)?",
     r"[0-9]{2,6}-[0-9]{1,4}"),
    ("PSCNOTE", r"pscnote", r"[0-9]{1,6}(?:\.[0-9]{1,4})?"),
    ("DoDFMR", r"(?:department ?of ?defense ?financial ?management ?regulation|dod ?fmr),? ?",
     r"Volume ?[0-9]{1,3}[A-Z]?"),
    ("PSCINST", r"pscinst", r"[A-Z]?[0-9]{2,6}(?:\.?[0-9]{1,3})?"),
    ("CGTTP", r"cgttp",
     r"(?:[0-9]{1,2}-[0-9]{1,2}){1,3}(?:-[0-9]{1,2})?[A-Z]?(?:\.[0-9]{1,2}[A-Z]?)?"),
    ("NTTP", r"nttp",
     r"(?:[0-9]{1,2}-[0-9]{1,2}){1,3}(?:-[0-9]{1,2})?[A-Z]?(?:\.[0-9]{1,2}[A-Z]?)?"),
    ("DHS Directive", r"dhs ?directive(?: ?no\.?)?", _DASH("1,3", "1,3")),
    ("HSPD", r"(?:hspd|homeland ?security ?presidential ?directive)[ -]?", r"[0-9]{1,3}"),
    ("OPNAVINST", r"opnavinst|opnav ?instruction", r"[0-9]{1,6}\.[0-9]{1,3}[A-Z]?"),
    ("CGTO", r"cgto ", r"(?:PG)?[- ]?(?:[0-9]{1,4}[A-Z]?-){1,3}[0-9]{0,4}[A-Z]?"),
    ("DHA Procedural Instructions", r"dha ?procedural ?instructions? ",
     r"[0-9]{1,6}(?:\.[0-9]{1,4})?"),
    ("DHA Procedures Manuals", r"dha ?procedures? ?manuals? ",
     r"[0-9]{1,6}(?:\.[0-9]{1,4})?(?:,? ?(?:Vol|Volumes?)[,.]? ?[0-9]{1,3}(?:-[0-9]{1,3})?)?"),
    ("DHA Technical Manuals", r"dha ?technical ?manuals? ",
     r"[0-9]{1,6}(?:\.[0-9]{1,4})?(?:,? ?(?:Vol|Volumes?)[,.]? ?[0-9]{1,3}(?:-[0-9]{1,3})?)?"),
    ("DHA Administrative Instructions", r"dha ?administrative ?instructions? ",
     r"[0-9]{1,6}(?:\.[0-9]{1,4})?(?:, ?Change ?[0-9]{1,3})?"),
    ("BUPERSINST", r"bupersinst ",
     r"(?:BUPERSNOTE ?)?[0-9]{1,6}(?:\.[0-9]{1,4}[A-BD-UW-Z]?)?(?: ?(?:CH|VOL) ?[0-9]{1,3})?"),
    ("NAVAIR", r"navair ", r"[0-9]{1,3}(?:-[0-9A-Z]{1,5}){0,4}"),
    ("NFPA", r"nfpa|national ?fire ?protection ?association", r"[0-9]{1,5}"),
    ("MIL-STD", r"mil(?:itary)? ?-? ?(?:standard|std) ?-?", r"[0-9]{1,5}[A-Z]?"),
    ("NAVEDTRA", r"navedtra ", r"[0-9][A-Z0-9]{0,6}(?:-[A-Z0-9]{1,6}){0,2}"),
    ("NAVMED", r"navmed|navy ?medicine", r"(?:P-)?[0-9]{1,4}(?:[/-][0-9]{1,4}){0,3}"),
    ("NEHC Technical Manual",
     r"(?:nehc|navy ?environmental ?health ?center)[ -]?(?:technical ?manual|t[ \.]?m\.?)",
     r"(?:[A-Z]{2} ?)?[0-9]{2,5}(?:[\.-][0-9A-Z]{1,3}){0,2}"),
    ("NAVSEA", r"navsea ",
     r"(?:[A-Z]{1,2}[ -]?)?[0-9]{1,4}(?:-[0-9]{1,6}|-[A-Z]{1,6}){1,4}(?: ?REV ?[0-9]{1,2})?"),
    ("MARADMIN", r"maradmin ", r"[0-9]{1,4}[/-][0-9]{1,4}\b"),
    ("H.R.", r"h ?\.? ?r\.? ?", r"[0-9]{1,6}\b"),
    ("NAVADMIN", r"navadmin ?", r"[0-9]{2,7}(?:/[0-9]{2,7})?\b"),
    ("MILPERSMAN", r"milpersman ?", r"[0-9]{2,5}-[0-9]{2,6}\b"),
    ("ALNAV", r"alnav ?", r"[0-9]{2,4}/[0-9]{2,4}"),
    ("BUMEDINST", r"bumedinst ?", r"[0-9]{3,6}(?:\.[0-9]{1,4}[A-Z]?)?"),
    ("STANAG", r"stanag ?", r"[0-9]{3,6}\b"),
    ("COMNAVRESFORCOMINST", r"comnavresforcominst ?",
     r"[0-9]{3,6}(?:\.[0-9]{1,3}[A-Z]?)?(?: ?CH[ -]?[0-9]{1,2})?"),
    ("OPNAVNOTE", r"opnav ?note ?", r"[0-9]{3,6}\b"),
    ("S. Res.", r"s ?\.? ?res ?\.? ?(?:no\.? ?)?", r"[0-9]{1,5}"),
    ("PGI", r"pgi ?(?:subpart ?)?", r"[0-9]{2,5}(?:[\.-][0-9]{1,5}[A-Z]?\b)?"),
    ("DFARS", r"(?:dfars|defense ?federal ?acquisition ?regulation ?supplement) ?", _PARTNUM),
    ("FAR", r"(?:far|federal ?acquisition ?regulation) ?", _PARTNUM),
    ("H.J.Res.", r"h ?[,\.]? ?j ?[,\.]? ?res\.? ?", r"[0-9]{1,4}"),
    ("DCMA Manual", r"dcma[ -]?man(?:ual)?[ -]?", r"[0-9]{2,6}(?:-[0-9]{2,6})?"),
    ("CNGBI", r"cngbi|chief ?national ?guard ?bureau ?instructions?",
     r"[0-9]{3,5}\.[0-9]{1,5}[A-Z]?(?:,? ?Vol(?:ume|\.)? ?[0-9]{1,4})?"),
    ("S.Con.Res.", r"s\.? ?con\.? ?res\.? ?", r"[0-9]{1,3}"),
    ("AMedP", r"(?:amedp|allied ?medical ?publications?)\]?[- ]?",
     r"[0-9]{1,3}(?:\[[A-Z]\]|[A-Z])?(?:\.[0-9]{1,3}[A-Z]?)?"
     r"(?:,? ?Edition ?[A-Z]{1,2},?)?(?: ?Version ?[0-9]{1,2})?"),
    ("SFFAS", r"(?:sffas|statement ?of ?federal ?financial ?accounting ?standards?) ?(?:no\.? ?)?",
     r"[0-9]{1,3}\b"),
    ("TRADOC Regulations (TRs)", r"tr|tradoc ?regulations?", _DASH("1,4", "1,4") + r"\b"),
    ("DCMA Instruction", r"(?:dcma|defense ?contract ?management ?agency)[ -]?inst(?:ruction)? ?",
     r"[0-9]{3,5}(?:\.[0-9]{1,3}[A-Z]?)?\b"),
    ("BUMEDNOTE", r"(?:bumed|bureau ?of ?medicine ?and ?surgery) ?not(?:e|ice) ?", r"[0-9]{2,6}"),
    ("RESPERSMAN", r"(?:respers|reserve ?personnel) ?m(?:an(?:ual)?)?[ -]",
     r"[0-9]{3,5}(?:[\.-][0-9]{1,4})?"),
)


def make_ref_patterns() -> dict[str, re.Pattern]:
    """Citation-type → compiled pattern; each has exactly one capture
    group holding the numeric part (``ref_utils.py::make_dict`` contract,
    full 100+-type library incl. the non-templated USC-Title / CFR-Title /
    PL shapes)."""
    p: dict[str, re.Pattern] = {}
    for typ, heads, shape in _CITE_TABLE:
        p[typ] = re.compile(rf"\b(?:{heads}) ?({shape})", re.IGNORECASE)
    # USC Title: number can lead ("10 U.S.C.") or trail ("U.S.C. Title 10");
    # two alternates, still one *non-empty* group per match (collect_refs
    # drops the empty one).
    usc = r"U\.? ?S\.? ?C\.?|United States Code|U\.? ?S\.? ?Code"
    p["Title"] = re.compile(
        rf"(?:([0-9]{{1,3}}),? (?:{usc}))|(?:(?:{usc})(?:,? ?Title)? ([0-9]{{1,3}}))"
        rf"|\btitle ?([0-9]{{1,2}})\b",
        re.IGNORECASE,
    )
    # CFR Title: number leads — "32 CFR" / "Title 32 of the Code of
    # Federal Regulations".
    p["CFR Title"] = re.compile(
        r"(?:title ?)?([0-9]{1,3}) ?(?:of the )?,? ?(?:CFR|Code of Federal Regulations)",
        re.IGNORECASE,
    )
    # Public Law: P.L. / Pub. Law / Public Law No. 117-81
    p["PL"] = re.compile(
        r"(?:P\.?|Pub\.?|Public) ?(?:L\.?|Law) ?(?:No\.?|Number)? ?([0-9]{1,4}-[0-9]{1,4})",
        re.IGNORECASE,
    )
    return p


def _head_literal(alt: str) -> str | None:
    """Conservative REQUIRED literal of one head alternative: the
    leading [a-z0-9] run, trimmed by one when the next regex char makes
    its last character optional. None = no usable literal (caller must
    always run the pattern)."""
    m = re.match(r"[a-z0-9]+", alt)
    if not m:
        return None
    lit = m.group(0)
    rest = alt[m.end():]
    if rest[:1] in ("?", "*") or rest[:2] == "{0":
        lit = lit[:-1]
    return lit if len(lit) >= 2 else None


def make_ref_prefilters() -> dict[str, list[str] | None]:
    """Citation-type → list of literal strings, at least one of which
    MUST appear (lowercased) in a text for that type's pattern to
    possibly match — or None when no sound literal exists. Derived from
    the head alternations of ``_CITE_TABLE``: every head alternative
    starts with a mandatory literal run ("dod", "cjcs", "chairman", …),
    so a batch whose joined text contains none of them cannot match and
    the regex pass is skipped outright. Soundness (never skips a
    matching pattern) is property-tested against per-type sample
    corpora in tests/test_citations.py."""
    out: dict[str, list[str] | None] = {}
    for typ, heads, _shape in _CITE_TABLE:
        lits = [_head_literal(a) for a in heads.split("|")]
        out[typ] = None if any(l is None for l in lits) else lits  # type: ignore[misc]
    # handwritten multi-shape patterns: no single sound literal
    out["Title"] = None
    out["CFR Title"] = None
    out["PL"] = None
    return out


# numeric range guards (ref_list.py:41-56): out-of-range numbers are not refs
_RANGE_GUARDS = {"Title": (1, 53), "CFR Title": (1, 50)}


def collect_refs(text: str, patterns: dict[str, re.Pattern]) -> dict[str, int]:
    """All normalized references + counts in one text
    (``ref_list.py::collect_ref_list`` semantics)."""
    out: dict[str, int] = {}
    text = preprocess_text(text)
    for ref_type, pattern in patterns.items():
        for match in pattern.findall(text):
            if isinstance(match, tuple):
                vals = [x for x in match if x != ""]
                if len(vals) != 1:
                    continue
                match = vals[0]
            if match == "":
                continue
            guard = _RANGE_GUARDS.get(ref_type)
            if guard:
                try:
                    n = int(match.strip())
                except ValueError:
                    continue
                if not (guard[0] <= n <= guard[1]):
                    continue
            ref = f"{ref_type} {match.strip()}"
            out[ref] = out.get(ref, 0) + 1
    return out


def collect_refs_batched(
    texts: list[str], patterns: dict[str, re.Pattern],
    prefilters: dict[str, list[str] | None] | None = None,
) -> list[dict[str, int]]:
    """:func:`collect_refs` over a whole batch with ONE ``finditer`` per
    pattern: texts are joined on ``\\x00`` (no citation pattern can match
    or cross it — every pattern consumes word/digit/space/dash
    characters only, and ``\\b`` behaves identically against NUL and
    string edges since both are non-word) and matches map back to their
    document by a ``searchsorted`` over the join offsets. Identical
    results to the per-doc loop (property-tested); what changes is the
    Python-call count — P patterns × D docs calls become P calls per
    batch, which is where the per-batch wall time of a 125-pattern
    library actually goes."""
    pre = [preprocess_text(t) for t in texts]
    joined = "\x00".join(pre)
    bounds = np.cumsum([len(p) + 1 for p in pre])  # exclusive doc ends
    out: list[dict[str, int]] = [{} for _ in texts]
    if prefilters is None:
        prefilters = make_ref_prefilters()
    joined_l = joined.lower()  # patterns are IGNORECASE; one C-level pass
    for ref_type, pattern in patterns.items():
        lits = prefilters.get(ref_type)
        if lits is not None and not any(l in joined_l for l in lits):
            continue  # no head literal present → the pattern cannot match
        guard = _RANGE_GUARDS.get(ref_type)
        for m in pattern.finditer(joined):
            vals = [g for g in m.groups() if g] if m.groups() else []
            if len(vals) != 1:
                continue
            match = vals[0]
            if guard:
                try:
                    n = int(match.strip())
                except ValueError:
                    continue
                if not (guard[0] <= n <= guard[1]):
                    continue
            doc = int(np.searchsorted(bounds, m.start(), side="right"))
            ref = f"{ref_type} {match.strip()}"
            out[doc][ref] = out[doc].get(ref, 0) + 1
    return out


class RefExtractor:
    """Actor-pool stage: (doc_id, text) batches → (doc_id, ref, n) rows.
    Patterns compile once per actor; the whole batch is scanned with one
    ``finditer`` per pattern (``collect_refs_batched``)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.patterns = make_ref_patterns()
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, refs, counts = [], [], []
        per_doc = collect_refs_batched(list(df[self.text_col]), self.patterns)
        for did, found in zip(df[self.id_col], per_doc):
            for ref, n in found.items():
                ids.append(did)
                refs.append(ref)
                counts.append(n)
        return pd.DataFrame({"doc_id": ids, "ref": refs, "n": counts}).astype(
            {"n": "int64"}
        )


# ---------------------------------------------------------------------------
# Dates (§2.9, lib/dates.py)
# ---------------------------------------------------------------------------

_MONTHS_LONG = (
    "january|february|march|april|may|june|july|august|september|october|november|december"
)
_MONTHS_SHORT = r"jan\.?|feb\.?|mar\.?|apr\.?|may\.?|jun\.?|jul\.?|aug\.?|sep\.?|sept\.?|oct\.?|nov\.?|dec\.?"

PAT_DAY_MONTH_YEAR = re.compile(
    rf"(\d{{1,2}}\s*(?:{_MONTHS_LONG})\s*,*\s*\d{{4}})", re.IGNORECASE
)
PAT_DAY_MONTH_YEAR_SHORT = re.compile(
    rf"(\d{{1,2}}\s*(?:{_MONTHS_SHORT})\s*,*\s*\d{{4}})", re.IGNORECASE
)
PAT_MONTH_DAY_YEAR = re.compile(
    rf"((?:{_MONTHS_LONG})\s*\d{{1,2}}\s*,*\s*\d{{4}})", re.IGNORECASE
)
PAT_MONTH_DAY_YEAR_SHORT = re.compile(
    rf"((?:{_MONTHS_SHORT})\s*\d{{1,2}}\s*,*\s*\d{{4}})", re.IGNORECASE
)


def _parse_all(matches: list[str], fmt: str, short: bool) -> list[datetime.datetime]:
    out = []
    for m in matches:
        s = " ".join(m.replace(",", "").replace(".", "").split())
        if short:
            s = s.lower().replace("sept", "sep")
        try:
            out.append(datetime.datetime.strptime(s, fmt))
        except ValueError:
            continue  # matched shape but not a real date (e.g. 31 Feb)
    return out


def extract_dates(text: str) -> list[datetime.datetime]:
    """All dates found by the four extractors, deduplicated, sorted
    (``dates.py::dates_to_list`` merge semantics)."""
    found = []
    found += _parse_all(PAT_DAY_MONTH_YEAR.findall(text), "%d %B %Y", False)
    found += _parse_all(PAT_DAY_MONTH_YEAR_SHORT.findall(text), "%d %b %Y", True)
    found += _parse_all(PAT_MONTH_DAY_YEAR.findall(text), "%B %d %Y", False)
    found += _parse_all(PAT_MONTH_DAY_YEAR_SHORT.findall(text), "%b %d %Y", True)
    return sorted(set(found))


class DateExtractor:
    """Actor-pool stage: (doc_id, text) → (doc_id, date) exploded rows."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, dates = [], []
        for did, text in zip(df[self.id_col], df[self.text_col]):
            for d in extract_dates(text):
                ids.append(did)
                dates.append(d)
        return pd.DataFrame(
            {"doc_id": pd.Series(ids, dtype="int64"),
             "date": pd.Series(dates, dtype="datetime64[us]")}
        )


# ---------------------------------------------------------------------------
# Entities (M6)
# ---------------------------------------------------------------------------

# (term, type) gazetteer with overlapping/nested multi-word terms — the
# GraphRelations Orgs/Roles analog. Case-sensitive, like the reference's
# KeywordProcessor(case_sensitive=True).
GAZETTEER: tuple[tuple[str, str], ...] = (
    ("Department of Defense", "ORG"),
    ("Defense", "ORG"),
    ("Joint Chiefs of Staff", "ORG"),
    ("Chiefs of Staff", "ORG"),
    ("Staff", "ORG"),
    ("General Counsel", "PERSON"),
    ("Counsel", "PERSON"),
    ("United States", "GPE"),
    ("States", "GPE"),
    ("European Union", "ORG"),
    ("Union", "ORG"),
    ("Secretary", "PERSON"),
)

_SENTINEL = "\x01"


def gazetteer_order(gaz=GAZETTEER) -> list[tuple[str, str]]:
    """Match priority: longest term first (overlap removal — a longer
    entity claims its span before any nested shorter term can), term asc
    as the deterministic tie-break."""
    return sorted(gaz, key=lambda t: (-len(t[0]), t[0]))


class EntityExtractor:
    """Actor-pool stage: per-doc gazetteer mention counts with overlap
    removal → (doc_id, entity, ent_type, n_mentions) edge rows (the K11
    graph-writer columnar form: Document-MENTIONS-Entity).

    Vectorized masked replace chain: for each term in priority order, one
    C-level ``str.count`` + ``str.replace`` pass over the whole batch
    column; replaced spans are masked with a sentinel so shorter nested
    terms cannot re-match them."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.terms = gazetteer_order()
        self.escaped = [(re.compile(re.escape(t)), t, ty) for t, ty in self.terms]
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        col = df[self.text_col]
        ids = df[self.id_col].to_numpy()
        frames = []
        for pat, term, ent_type in self.escaped:
            counts = col.str.count(pat).to_numpy()
            hit = counts > 0
            if hit.any():
                frames.append(
                    pd.DataFrame(
                        {
                            "doc_id": ids[hit],
                            "entity": term,
                            "ent_type": ent_type,
                            "n_mentions": counts[hit].astype("int64"),
                        }
                    )
                )
                col = col.str.replace(term, _SENTINEL * len(term), regex=False)
        if not frames:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype=df[self.id_col].dtype),
                 "entity": pd.Series(dtype="object"),
                 "ent_type": pd.Series(dtype="object"),
                 "n_mentions": pd.Series(dtype="int64")}
            )
        out = pd.concat(frames, ignore_index=True)
        return out.sort_values(["doc_id", "entity"]).reset_index(drop=True)


# --- full-parity lookup gazetteer (entities_utils.py:1-187) ----------------

def replace_nonalpha_chars(text: str, replace_char: str = "") -> str:
    """Strip non-alphanumerics, squash runs of whitespace
    (``entities_utils.py::replace_nonalpha_chars`` semantics) — entity
    keys and document text are both normalized this way before matching."""
    text = re.sub(r"[^a-zA-Z0-9\s]+", replace_char, text)
    return re.sub(r"\s{2,}", " ", text)


# (name, ent_type, aliases ';'-joined, parent-org) — the GraphRelations
# Orgs/Roles analog (public DoD org/role names; the reference loads these
# from gamechangerml's GraphRelations.xls, sheets Orgs→ORG / Roles→PERSON,
# columns Name/Aliases/Parent — entities_utils.py:42-78).
DEFAULT_ENTITY_RECORDS: tuple[tuple[str, str, str, str], ...] = (
    ("Department of Defense", "ORG", "DoD;DOD", ""),
    ("Joint Chiefs of Staff", "ORG", "JCS", "Department of Defense"),
    ("Office of the Secretary of Defense", "ORG", "OSD", "Department of Defense"),
    ("Defense Information Systems Agency", "ORG", "DISA", "Department of Defense"),
    ("Defense Logistics Agency", "ORG", "DLA", "Department of Defense"),
    ("Defense Intelligence Agency", "ORG", "DIA", "Department of Defense"),
    ("National Security Agency", "ORG", "NSA", "Department of Defense"),
    ("National Guard Bureau", "ORG", "NGB", "Department of Defense"),
    ("Department of the Army", "ORG", "", "Department of Defense"),
    ("Department of the Navy", "ORG", "DON", "Department of Defense"),
    ("Department of the Air Force", "ORG", "DAF", "Department of Defense"),
    ("United States Marine Corps", "ORG", "USMC;Marine Corps", "Department of the Navy"),
    ("United States Coast Guard", "ORG", "USCG;Coast Guard", "Department of Homeland Security"),
    ("Defense Health Agency", "ORG", "DHA", "Department of Defense"),
    ("Defense Contract Management Agency", "ORG", "DCMA", "Department of Defense"),
    ("Defense Finance and Accounting Service", "ORG", "DFAS", "Department of Defense"),
    ("Government Accountability Office", "ORG", "GAO", ""),
    ("Office of Management and Budget", "ORG", "OMB", ""),
    ("Federal Emergency Management Agency", "ORG", "FEMA", "Department of Homeland Security"),
    ("North Atlantic Treaty Organization", "ORG", "NATO", ""),
    ("European Union", "ORG", "EU", ""),
    ("Secretary of Defense", "PERSON", "SECDEF", ""),
    ("Deputy Secretary of Defense", "PERSON", "DEPSECDEF", ""),
    ("Chairman of the Joint Chiefs of Staff", "PERSON", "CJCS Chairman", ""),
    ("General Counsel", "PERSON", "", ""),
    ("Inspector General", "PERSON", "", ""),
    ("Chief Information Officer", "PERSON", "CIO", ""),
    ("Under Secretary of Defense for Policy", "PERSON", "USDP", ""),
    ("Secretary of the Navy", "PERSON", "SECNAV", ""),
    ("Secretary of the Army", "PERSON", "", ""),
    ("Secretary of the Air Force", "PERSON", "SECAF", ""),
    ("United States", "GPE", "", ""),
    ("District of Columbia", "GPE", "", ""),
)

_MUST_INCLUDE = {"DoD": "ORG", "DOD": "ORG", "Department of Defense": "ORG"}


def make_entities_lookup_dict(
    records: tuple = DEFAULT_ENTITY_RECORDS,
    must_include: dict[str, str] = _MUST_INCLUDE,
) -> dict[str, dict[str, str]]:
    """normalized-key → {raw_ent (standardized name), ent_type}
    (``entities_utils.py::make_entities_lookup_dict`` contract): keys are
    alphanumeric-normalized; every key also gets an UPPER variant; alias
    keys map back to the record's standardized name; parent orgs become
    ORG entries; must_include entries are added only if absent."""
    ents: dict[str, dict[str, str]] = {}

    def add(ent: str, ent_type: str, std: str | None = None) -> None:
        ent = ent.strip()
        key = replace_nonalpha_chars(ent)
        if not key:
            return
        val = {"raw_ent": std or ent, "ent_type": ent_type}
        ents[key] = val
        ents[key.upper()] = val

    for name, ent_type, aliases, parent in records:
        add(name, ent_type)
        for alias in aliases.split(";"):
            if alias:
                add(alias, ent_type, std=name)
        if parent:
            add(parent, "ORG")
    for ent, ent_type in must_include.items():
        key = replace_nonalpha_chars(ent)
        if key and key not in ents:
            val = {"raw_ent": ent, "ent_type": ent_type}
            ents[key] = val
            ents.setdefault(key.upper(), val)
    return ents


def lookup_order(ents: dict[str, dict[str, str]]) -> list[str]:
    """Match priority over lookup keys: longest first (overlap removal —
    ``remove_overlapping_ents`` keep-the-longest semantics), key asc as
    the deterministic tie-break."""
    return sorted(ents, key=lambda k: (-len(k), k))


class LookupEntityExtractor:
    """Full-parity gazetteer stage (M6): text and keys normalized with
    :func:`replace_nonalpha_chars`, matched case-sensitively longest-first
    with sentinel masking (keep-the-longest overlap removal), alias
    mentions aggregated under the record's STANDARDIZED name →
    (doc_id, entity, ent_type, n_mentions) edge rows.

    Matching is substring-based masked replace (vectorizable + SQL-
    mirrorable); the reference's flashtext trie adds word-boundary
    checks — equivalent here because longer keys claim their spans first
    and gazetteer keys carry uppercase letters real words don't embed."""

    def __init__(self, records: tuple = DEFAULT_ENTITY_RECORDS,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.lookup = make_entities_lookup_dict(records)
        self.keys = lookup_order(self.lookup)
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        col = (
            df[self.text_col]
            .str.replace(r"[^a-zA-Z0-9\s]+", "", regex=True)
            .str.replace(r"\s{2,}", " ", regex=True)
        )
        ids = df[self.id_col].to_numpy()
        frames = []
        for key in self.keys:
            counts = col.str.count(re.escape(key)).to_numpy()
            hit = counts > 0
            if hit.any():
                meta = self.lookup[key]
                frames.append(pd.DataFrame({
                    "doc_id": ids[hit],
                    "entity": meta["raw_ent"],
                    "ent_type": meta["ent_type"],
                    "n_mentions": counts[hit].astype("int64"),
                }))
                col = col.str.replace(key, _SENTINEL * len(key), regex=False)
        if not frames:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype=df[self.id_col].dtype),
                 "entity": pd.Series(dtype="object"),
                 "ent_type": pd.Series(dtype="object"),
                 "n_mentions": pd.Series(dtype="int64")}
            )
        out = (
            pd.concat(frames, ignore_index=True)
            .groupby(["doc_id", "entity", "ent_type"], as_index=False)["n_mentions"]
            .sum()
        )
        return out.sort_values(["doc_id", "entity"]).reset_index(drop=True)


_DEFAULT_LOOKUP = make_entities_lookup_dict()
_DEFAULT_KEYS = lookup_order(_DEFAULT_LOOKUP)


def parse_entities(text: str) -> list[str]:
    """Sorted unique STANDARDIZED entity names mentioned in one text —
    the scalar face of :class:`LookupEntityExtractor` (reference
    contract: ``responsibility_parse/responsibility_parser.py:90-109``
    normalize → gazetteer match → overlap removal → sorted unique).
    Used to attach entities to responsibility rows; returns names from
    the standardized-name column (aliases like "DIA" resolve to
    "Defense Intelligence Agency")."""
    t = replace_nonalpha_chars(text)
    found: set[str] = set()
    for key in _DEFAULT_KEYS:
        if key in t:
            found.add(_DEFAULT_LOOKUP[key]["raw_ent"])
            t = t.replace(key, _SENTINEL * len(key))
    return sorted(found)


def top_entities(edges: pd.DataFrame, k: int = 5) -> pd.DataFrame:
    """Per-doc top-k entities by mention count (``entities.py:113-117``
    ``Counter(...).most_common(5)`` analog), deterministic tie-break."""
    e = edges.sort_values(["doc_id", "n_mentions", "entity"], ascending=[True, False, True])
    return e.groupby("doc_id", sort=False).head(k).reset_index(drop=True)
