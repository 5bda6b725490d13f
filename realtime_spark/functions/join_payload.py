"""Channel-join payload validation — the WS ingress step that turns a raw
`phx_join` params map into the engine's subscription specs.

Reference: lib/realtime_web/channels/payloads/join.ex + config.ex +
broadcast.ex + broadcast/replay.ex + presence.ex + postgres_change.ex and
the FlexibleBoolean Ecto type (flexible_boolean.ex) — the Ecto embedded
schema pipeline behind `RealtimeChannel.join` (realtime_channel.ex:46-94,
SURVEY §3.1 step 1). Semantics ported, not the framework:

  - FlexibleBoolean: real booleans pass; the strings 'true'/'false' in any
    case cast; everything else (including 1/0/'yes') is an error.
  - strings (access_token/user_token/event/schema/table/filter) accept str
    only; presence.key is `:any` (string OR number allowed).
  - integers (replay.limit default 10, replay.since default 0) accept int,
    integral float, or int-string — Ecto's :integer cast.
  - config/broadcast/presence/replay must be maps -> error
    'unable to parse, expected a map'; postgres_changes must be a LIST of
    maps -> 'unable to parse, expected an array of maps'; nil and nil list
    entries normalize to [] (config.ex's attrs prefilter).
  - errors mirror Ecto's traverse_errors shape: a nested dict of
    field -> [message] / sub-map, only for fields that failed.

`subscription_specs` bridges a validated join to `subscriptions_df` input,
making this the front door of the CDC path rather than parity decoration.
"""

from __future__ import annotations

import re
import uuid
from dataclasses import dataclass, field
from typing import Any


def error_message(type_: str | None = None) -> str:
    return f"unable to parse, expected {type_}" if type_ else "unable to parse"


_MAP_ERR = [error_message("a map")]
_ARRAY_ERR = [error_message("an array of maps")]


def _flexible_bool(v: Any):
    """FlexibleBoolean.cast/1: {'ok', bool} or error (None here)."""
    if isinstance(v, bool):
        return v
    if isinstance(v, str):
        low = v.lower()
        if low == "true":
            return True
        if low == "false":
            return False
    return None


_INT_RE = re.compile(r"[+-]?[0-9]+")


def _cast_int(v: Any):
    # Ecto's :integer cast rejects floats (even integral ones) and accepts
    # only exact base-10 integer strings — no underscores, whitespace, or
    # non-ASCII digits, all of which Python's int() would admit. fullmatch,
    # not `^...$`: `$` matches before a trailing newline, so '5\n' would
    # pass, where Integer.parse/1 must consume the whole binary.
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return v
    if isinstance(v, str) and _INT_RE.fullmatch(v):
        return int(v)
    return None


@dataclass
class Replay:
    limit: int = 10
    since: int = 0


@dataclass
class Broadcast:
    ack: bool = False
    self: bool = False
    replication_ready: bool = False
    replay: Replay | None = None


@dataclass
class Presence:
    enabled: bool = False
    key: Any = None


@dataclass
class PostgresChange:
    event: str | None = None
    schema: str | None = None
    table: str | None = None
    filter: str | None = None


@dataclass
class Config:
    private: bool = False
    broadcast: Broadcast | None = None
    presence: Presence | None = None
    postgres_changes: list[PostgresChange] = field(default_factory=list)


@dataclass
class Join:
    config: Config | None = None
    access_token: str | None = None
    user_token: str | None = None


def _cast_fields(attrs: dict, spec: dict, out, errors: dict) -> None:
    """spec: field -> (caster, type-name-for-message)."""
    for name, (caster, tname) in spec.items():
        if name not in attrs or attrs[name] is None:
            continue
        v = caster(attrs[name])
        if v is None:
            errors[name] = [error_message(tname)]
        else:
            setattr(out, name, v)


def _cast_str(v: Any):
    return v if isinstance(v, str) else None


def _cast_any(v: Any):
    return v


def validate_join(params: dict) -> tuple[Join | None, dict | None]:
    """params -> (Join, None) or (None, errors) — Join.validate/1."""
    errors: dict = {}
    join = Join()
    _cast_fields(
        params,
        {"access_token": (_cast_str, "string"), "user_token": (_cast_str, "string")},
        join,
        errors,
    )

    if "config" in params and params["config"] is not None:
        raw = params["config"]
        if not isinstance(raw, dict):
            errors["config"] = _MAP_ERR
        else:
            cfg_errors: dict = {}
            cfg = Config()
            # config.ex prefilter: drop nil entries from any list value
            raw = {
                k: ([x for x in v if x is not None] if isinstance(v, list) else v)
                for k, v in raw.items()
            }
            if raw.get("postgres_changes", ()) is None:
                raw["postgres_changes"] = []
            _cast_fields(
                raw, {"private": (_flexible_bool, "boolean")}, cfg, cfg_errors
            )

            if "broadcast" in raw and raw["broadcast"] is not None:
                b = raw["broadcast"]
                if not isinstance(b, dict):
                    cfg_errors["broadcast"] = _MAP_ERR
                else:
                    b_err: dict = {}
                    bc = Broadcast()
                    _cast_fields(
                        b,
                        {
                            "ack": (_flexible_bool, "boolean"),
                            "self": (_flexible_bool, "boolean"),
                            "replication_ready": (_flexible_bool, "boolean"),
                        },
                        bc,
                        b_err,
                    )
                    if "replay" in b and b["replay"] is not None:
                        r = b["replay"]
                        if not isinstance(r, dict):
                            b_err["replay"] = _MAP_ERR
                        else:
                            r_err: dict = {}
                            rp = Replay()
                            _cast_fields(
                                r,
                                {
                                    "limit": (_cast_int, "integer"),
                                    "since": (_cast_int, "integer"),
                                },
                                rp,
                                r_err,
                            )
                            if r_err:
                                b_err["replay"] = r_err
                            else:
                                bc.replay = rp
                    if b_err:
                        cfg_errors["broadcast"] = b_err
                    else:
                        cfg.broadcast = bc

            if "presence" in raw and raw["presence"] is not None:
                p = raw["presence"]
                if not isinstance(p, dict):
                    cfg_errors["presence"] = _MAP_ERR
                else:
                    p_err: dict = {}
                    pr = Presence()
                    _cast_fields(
                        p,
                        {
                            "enabled": (_flexible_bool, "boolean"),
                            "key": (_cast_any, None),
                        },
                        pr,
                        p_err,
                    )
                    if p_err:
                        cfg_errors["presence"] = p_err
                    else:
                        cfg.presence = pr

            if "postgres_changes" in raw:
                pcs = raw["postgres_changes"]
                if not isinstance(pcs, list):
                    cfg_errors["postgres_changes"] = _ARRAY_ERR
                else:
                    out_pcs: list[PostgresChange] = []
                    pc_errors: list[dict] = []
                    any_err = False
                    for entry in pcs:
                        if not isinstance(entry, dict):
                            cfg_errors["postgres_changes"] = _ARRAY_ERR
                            any_err = True
                            break
                        e_err: dict = {}
                        pc = PostgresChange()
                        _cast_fields(
                            entry,
                            {
                                "event": (_cast_str, "string"),
                                "schema": (_cast_str, "string"),
                                "table": (_cast_str, "string"),
                                "filter": (_cast_str, "string"),
                            },
                            pc,
                            e_err,
                        )
                        out_pcs.append(pc)
                        pc_errors.append(e_err)
                        any_err = any_err or bool(e_err)
                    if any_err and "postgres_changes" not in cfg_errors:
                        cfg_errors["postgres_changes"] = pc_errors
                    elif not any_err:
                        cfg.postgres_changes = out_pcs

            if cfg_errors:
                errors["config"] = cfg_errors
            else:
                join.config = cfg

    if errors:
        return None, errors
    return join, None


# -- accessor parity (join.ex:35-51) -----------------------------------------


def presence_enabled(join: Join | None) -> bool:
    if isinstance(join, Join) and join.config and join.config.presence:
        return join.config.presence.enabled
    return False


def presence_key(join: Join | None) -> Any:
    if isinstance(join, Join) and join.config and join.config.presence:
        k = join.config.presence.key
        if k not in (None, ""):
            return k
    return str(uuid.uuid1())


def ack_broadcast(join: Join | None) -> bool:
    if isinstance(join, Join) and join.config and join.config.broadcast:
        return join.config.broadcast.ack
    return False


def self_broadcast(join: Join | None) -> bool:
    if isinstance(join, Join) and join.config and join.config.broadcast:
        return join.config.broadcast.self
    return False


def private(join: Join | None) -> bool:
    if isinstance(join, Join) and join.config:
        return join.config.private
    return False


def subscription_specs(
    join: Join, subscription_id_prefix: str = "sub"
) -> list[dict]:
    """pg_change_params bridge (realtime_channel.ex:878-913): one
    subscriptions_df spec per validated postgres_changes entry — '*' event
    maps to the engine's action wildcard, absent schema/table wildcard."""
    specs = []
    if not (join.config and join.config.postgres_changes):
        return specs
    for i, pc in enumerate(join.config.postgres_changes):
        spec: dict = {"subscription_id": f"{subscription_id_prefix}-{i}"}
        spec["schema"] = pc.schema or "*"
        spec["table"] = pc.table or "*"
        if pc.event and pc.event != "*":
            spec["action"] = pc.event
        if pc.filter:
            spec["filters"] = pc.filter
        specs.append(spec)
    return specs
