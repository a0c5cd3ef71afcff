"""Snort/Sagan-style rule-text parser → model.Rule (S10, [PUB src/rules.c]).

Grammar (the Sagan dialect subset our engine supports):

    alert any any -> any any (msg:"..."; sid:1000001; rev:1; \
        classtype:tool-failure; priority:3; program:assistant|tool; \
        content:"error"; nocase; offset:0; depth:30; \
        content:"omega"; distance:1; within:40; content:!"decoy"; \
        pcre:"/tool\\s+timeout/i"; meta_content:"%sagan%",ssh,ftp,telnet; \
        normalize:"code=(?P<code>\\d+)"; field:code>=500; field:proto in tcp|udp; \
        parse_hash:md5; parse_src_ip:1; parse_port; parse_proto; \
        level:1|2; alert_time:8-18; \
        after:track by_src, count 5, seconds 300; \
        threshold:type limit, track by_src, count 2, seconds 600; \
        flexbits:set,auth_fail,900; flexbits:isset,auth_fail; \
        default:proto=tcp; depends_on:1000001; noalert; \
        sink:fast;)

Mapping notes (payload transposition, BASELINE.json:6): ``program`` →
role prefilter, ``facility`` → tool prefilter, ``track by_src`` →
conv_id, ``track by_dst`` → tool (the destination analogue: which tool the
turn targeted), ``track by_both`` → the (conv_id, tool) composite,
``track by_username`` → role. Content modifiers (nocase/offset/
depth/distance/within) attach to the most recent content, as in Snort.
Lines starting with '#' and blank lines are skipped.
"""

from __future__ import annotations

import re

from .model import (
    AfterSpec,
    AlertTime,
    ContentSpec,
    EnrichCond,
    FieldCond,
    FlexbitSpec,
    GrokSpec,
    HashSpec,
    MetaContentSpec,
    PcreSpec,
    Rule,
    RuleSet,
    ThresholdSpec,
    TokenSpec,
)

# parse_src_ip / parse_dst_ip / parse_port / parse_proto rule keywords
# ([PUB src/parsers/parse-ip.c, parse-port.c, parse-proto.c], P10/P11):
# keyword → (extracted field, token kind, default position). Bare
# parse_dst_ip takes the SECOND address — "connection from A to B" reads
# naturally, matching the reference's src/dst convention.
_TOKEN_KW = {
    "parse_src_ip": ("src_ip", "ip", 1),
    "parse_dst_ip": ("dst_ip", "ip", 2),
    "parse_port": ("port", "port", 1),
    "parse_proto": ("proto", "proto", 1),
}

_HEADER = re.compile(r"^\s*alert\s+\S+\s+\S+\s*->\s*\S+\s+\S+\s*\((.*)\)\s*$", re.DOTALL)
_TRACK = {"by_src": "conv_id", "by_dst": "tool", "by_both": "conv_tool", "by_username": "role"}


def _split_options(body: str) -> list[str]:
    """Split on ';' except inside double quotes."""
    out, cur, inq = [], [], False
    for ch in body:
        if ch == '"':
            inq = not inq
            cur.append(ch)
        elif ch == ";" and not inq:
            s = "".join(cur).strip()
            if s:
                out.append(s)
            cur = []
        else:
            cur.append(ch)
    s = "".join(cur).strip()
    if s:
        out.append(s)
    return out


def _unquote(v: str) -> str:
    v = v.strip()
    if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
        v = v[1:-1]
    return v.replace('\\"', '"').replace("\\\\", "\\").replace("\\;", ";")


def _kv(opt: str) -> tuple[str, str]:
    if ":" in opt:
        k, v = opt.split(":", 1)
        return k.strip().lower(), v.strip()
    return opt.strip().lower(), ""


def _parse_counter(v: str) -> dict:
    d: dict = {}
    for part in v.split(","):
        part = part.strip()
        if part.startswith("track"):
            d["track"] = _TRACK[part.split()[1]]
        elif part.startswith("count"):
            d["count"] = int(part.split()[1])
        elif part.startswith("seconds"):
            d["seconds"] = int(part.split()[1])
        elif part.startswith("type"):
            d["type"] = part.split()[1]
    return d


def parse_rule(line: str) -> Rule:
    m = _HEADER.match(line)
    if not m:
        raise ValueError(f"not a rule line: {line[:80]!r}")
    opts = _split_options(m.group(1))

    kw: dict = dict(sid=None, msg="", sink="fast")
    contents: list[ContentSpec] = []
    pcres: list[PcreSpec] = []
    metas: list[MetaContentSpec] = []
    groks: list[GrokSpec] = []
    hashes: list[HashSpec] = []
    tokens: list[TokenSpec] = []
    fields: list[FieldCond] = []
    flex: list[FlexbitSpec] = []
    enrich: list[EnrichCond] = []
    defaults: list[tuple[str, str]] = []

    def last_content() -> ContentSpec:
        if not contents:
            raise ValueError("content modifier before any content")
        return contents[-1]

    def replace_last(**ch) -> None:
        import dataclasses

        contents[-1] = dataclasses.replace(last_content(), **ch)

    for opt in opts:
        k, v = _kv(opt)
        if k == "msg":
            kw["msg"] = _unquote(v)
        elif k == "sid":
            kw["sid"] = int(v)
        elif k == "rev":
            kw["rev"] = int(v)
        elif k == "classtype":
            kw["rule_class"] = _unquote(v)
        elif k == "priority":
            kw["priority"] = int(v)
        elif k == "sink":
            kw["sink"] = _unquote(v)
        elif k == "noalert":
            kw["noalert"] = True
        elif k == "depends_on":
            kw["depends_on"] = int(v)
        elif k == "program":
            neg = v.startswith("!")
            kw["roles"] = tuple(_unquote(v.lstrip("!")).split("|"))
            kw["roles_negated"] = neg
        elif k == "facility":
            neg = v.startswith("!")
            kw["tools"] = tuple(_unquote(v.lstrip("!")).split("|"))
            kw["tools_negated"] = neg
        elif k == "content":
            neg = v.startswith("!")
            contents.append(ContentSpec(_unquote(v.lstrip("!")), negated=neg))
        elif k == "nocase":
            replace_last(nocase=True)
        elif k == "offset":
            replace_last(offset=int(v))
        elif k == "depth":
            replace_last(depth=int(v))
        elif k == "distance":
            replace_last(distance=int(v))
        elif k == "within":
            replace_last(within=int(v))
        elif k == "fast_pattern":
            lit, _, flag = v.partition(",")
            kw["fast_pattern"] = (_unquote(lit), flag.strip() == "nocase")
        elif k == "pcre":
            raw = _unquote(v)
            neg = raw.startswith("!")
            raw = raw.lstrip("!")
            if not (raw.startswith("/") and raw.rfind("/") > 0):
                raise ValueError(f"pcre must be /pattern/flags: {raw!r}")
            i = raw.rfind("/")
            pcres.append(PcreSpec(raw[1:i], raw[i + 1 :], negated=neg))
        elif k == "meta_content":
            tmpl, *vals = v.split(",")
            metas.append(MetaContentSpec(_unquote(tmpl), tuple(x.strip() for x in vals)))
        elif k == "normalize":
            groks.append(GrokSpec(_unquote(v)))
        elif k == "parse_hash":
            hashes.append(HashSpec(_unquote(v)))
        elif k in _TOKEN_KW:
            fieldname, kind, default_pos = _TOKEN_KW[k]
            tokens.append(TokenSpec(fieldname, kind, position=int(v) if v else default_pos))
        elif k == "level":
            # level:0|1|2 — syslog level/priority prefilter (P2). Payload
            # transposition: level ↔ role_dim.trust_level (a total function
            # of role, so it constant-folds into the role membership mask
            # exactly like facility→tool).
            levels = tuple(int(x) for x in _unquote(v).split("|"))
            enrich.append(EnrichCond("role_dim", "trust_level", "is", levels))
        elif k == "field":
            fm = re.match(r"(\w+)\s*(>=|<=|==|>|<)\s*(\S+)", v)
            if fm:
                fields.append(FieldCond(fm.group(1), fm.group(2), float(fm.group(3))))
            else:
                fm = re.match(r"(\w+)\s+(in|not_in)\s+(\S+)", v)
                if not fm:
                    raise ValueError(f"bad field condition {v!r}")
                fields.append(
                    FieldCond(fm.group(1), fm.group(2), tuple(fm.group(3).split("|")))
                )
        elif k == "default":
            name, _, val = v.partition("=")
            defaults.append((name.strip(), val.strip()))
        elif k == "alert_time":
            # alert_time:8-18  or  alert_time:8-18,1|2|3|4|5 (ISO weekdays)
            hours, _, days = v.partition(",")
            lo, _, hi = hours.partition("-")
            dayspec = (
                tuple(int(x) for x in days.strip().split("|")) if days.strip() else None
            )
            kw["alert_time"] = AlertTime(int(lo), int(hi), days=dayspec)
        elif k == "after":
            d = _parse_counter(v)
            kw["after"] = AfterSpec(track=d.get("track", "conv_id"), count=d["count"], seconds=d["seconds"])
        elif k == "threshold":
            d = _parse_counter(v)
            kw["threshold"] = ThresholdSpec(
                type=d.get("type", "limit"), track=d.get("track", "conv_id"),
                count=d["count"], seconds=d["seconds"],
            )
        elif k == "flexbits" or k == "xbits":
            parts = [p.strip() for p in v.split(",")]
            action, name = parts[0], parts[1]
            expire = int(parts[2]) if len(parts) > 2 else None
            flex.append(FlexbitSpec(action, name, expire=expire))
        elif k == "enrich":
            # enrich:dim,field,op,v1|v2  (engine extension — Sagan spreads
            # these over country_code/blacklist/bluedot keywords)
            dim, fieldname, op, vals = (x.strip() for x in v.split(",", 3))
            parsed = tuple(
                True if x == "true" else False if x == "false" else x
                for x in vals.split("|")
            )
            enrich.append(EnrichCond(dim, fieldname, op, parsed))
        elif k == "country_code":
            # country_code:isnot US|DE  → role_dim origin condition (J1)
            op, _, vals = v.partition(" ")
            enrich.append(EnrichCond("role_dim", "origin", op.strip(), tuple(vals.strip().split("|"))))
        else:
            raise ValueError(f"unknown rule option {k!r}")

    if kw["sid"] is None:
        raise ValueError("rule missing sid")
    return Rule(
        **kw,
        contents=tuple(contents),
        pcres=tuple(pcres),
        meta_contents=tuple(metas),
        groks=tuple(groks),
        hashes=tuple(hashes),
        tokens=tuple(tokens),
        field_conds=tuple(fields),
        defaults=tuple(defaults),
        flexbits=tuple(flex),
        enrich=tuple(enrich),
    )


def parse_rules(text: str) -> RuleSet:
    rules = []
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        rules.append(parse_rule(line))
    return RuleSet(tuple(rules))


def load_rules(path: str) -> RuleSet:
    with open(path) as f:
        return parse_rules(f.read())
