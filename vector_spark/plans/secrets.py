"""Config secret-backend interpolation — ``SECRET[backend.key]``.

Reference semantics (src/config/loading/secret.rs, src/secrets/):

- placeholders match ``SECRET[<word>.<word-or-dots>]``; the first segment
  names a ``[secret.<backend>]`` table in the same config, the remainder
  (dots allowed) is the key passed to that backend
  (secret.rs:25-31 — ``SECRET[a..b.c]`` captures key ``.b.c``)
- collection happens just after env-var interpolation, before the config
  is compiled (secret.rs:92-101); every placeholder must resolve or the
  load errors with the full miss list (secret.rs:129-151)
- backends (src/secrets/): ``test`` replaces every key with a fixed
  string (test.rs), ``file`` reads one JSON object mapping key->secret
  (file.rs — missing or empty secret is an error), ``directory`` reads
  one file per key with optional trailing-whitespace strip
  (directory.rs), ``exec`` spawns a command, writes a JSON query
  ``{"version":"1.0","secrets":[...]}`` on stdin and reads a JSON map
  ``key -> {value, error}`` from stdout (exec.rs:40-99).

Spark posture: secrets resolve ONCE on the driver at config-load time —
they parameterize the compiled plan (paths, tokens in sink configs), so
nothing secret-related ever ships row-wise through the cluster.
"""

from __future__ import annotations

import json
import re
import subprocess
from pathlib import Path

# secret.rs:31 — backend is [[:word:]]+, key is [[:word:].]+
COLLECTOR = re.compile(r"SECRET\[(\w+)\.([\w.]+)\]")


def collect_secret_keys(text: str) -> dict[str, set[str]]:
    """All ``backend -> {keys}`` referenced by placeholders in the config
    text (secret.rs:114-127)."""
    keys: dict[str, set[str]] = {}
    for backend, key in COLLECTOR.findall(text):
        keys.setdefault(backend, set()).add(key)
    return keys


def _retrieve_one(backend_cfg: dict, keys: set[str], base: Path) -> dict[str, str]:
    t = backend_cfg.get("type")
    if t == "test":
        # test.rs: fixed replacement for every key
        rep = backend_cfg.get("replacement", "")
        return {k: rep for k in keys}
    if t == "file":
        # file.rs: one JSON object; missing or empty key is an error
        path = base / backend_cfg["path"]
        data = json.loads(path.read_text())
        out = {}
        for k in keys:
            if k not in data:
                raise ValueError(f"secret for key '{k}' was not retrieved")
            if not data[k]:
                raise ValueError(f"secret for key '{k}' was empty")
            out[k] = str(data[k])
        return out
    if t == "directory":
        # directory.rs: one file per key, optional trim of trailing ws
        root = base / backend_cfg["path"]
        trim = backend_cfg.get("remove_trailing_whitespace", False)
        out = {}
        for k in keys:
            contents = (root / k).read_text()
            secret = contents.rstrip() if trim else contents
            if not secret:
                raise ValueError(f"secret in file '{k}' was empty")
            out[k] = secret
        return out
    if t == "exec":
        # exec.rs: JSON query on stdin -> JSON {key: {value,error}} on stdout
        cmd = backend_cfg["command"]
        query = json.dumps({"version": "1.0", "secrets": sorted(keys)})
        timeout = backend_cfg.get("timeout", 5)
        proc = subprocess.run(
            cmd, input=query, capture_output=True, text=True, timeout=timeout
        )
        if proc.returncode != 0:
            raise ValueError(f"secret backend command failed: {proc.stderr[:500]}")
        resp = json.loads(proc.stdout)
        out = {}
        for k in keys:
            entry = resp.get(k)
            if entry is None:
                raise ValueError(f"secret for key '{k}' was not retrieved")
            if entry.get("error"):
                raise ValueError(
                    f"secret for key '{k}' was not retrieved: {entry['error']}"
                )
            if not entry.get("value"):
                raise ValueError(f"secret for key '{k}' was empty")
            out[k] = entry["value"]
        return out
    raise ValueError(f"unknown secret backend type {t!r}")


def retrieve(
    backends: dict[str, dict], wanted: dict[str, set[str]], base: Path | str = "."
) -> dict[str, str]:
    """Resolve every referenced ``backend.key`` to its secret value
    (secret.rs:55-83: unknown backend is an error)."""
    base = Path(base)
    secrets: dict[str, str] = {}
    for backend_name, keys in wanted.items():
        if backend_name not in backends:
            raise ValueError(
                f'Backend "{backend_name}" is required for secret retrieval '
                "but was not found in config."
            )
        got = _retrieve_one(backends[backend_name], keys, base)
        for k, v in got.items():
            secrets[f"{backend_name}.{k}"] = v
    return secrets


def interpolate_secrets(text: str, secrets: dict[str, str]) -> str:
    """Replace every placeholder; unresolved placeholders error with the
    full list (secret.rs:129-151)."""
    errors: list[str] = []

    def sub(m: re.Match) -> str:
        key = f"{m.group(1)}.{m.group(2)}"
        if key in secrets:
            return secrets[key]
        errors.append(f"Unable to find secret replacement for {m.group(0)}.")
        return ""

    out = COLLECTOR.sub(sub, text)
    if errors:
        raise ValueError("; ".join(errors))
    return out


def resolve_config_secrets(text: str, parse, base: Path | str = ".") -> str:
    """Full pipeline over raw (already env-interpolated) config text:
    parse the [secret.*] tables with the caller's format parser, collect
    placeholders, retrieve, interpolate. No placeholders -> text
    unchanged, no backend ever runs
    (SecretBackendLoader::has_secrets_to_retrieve)."""
    wanted = collect_secret_keys(text)
    if not wanted:
        return text
    doc = parse(text)
    backends = (doc or {}).get("secret", {})
    secrets = retrieve(backends, wanted, base)
    return interpolate_secrets(text, secrets)
