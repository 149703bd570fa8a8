'use strict';
// Differential-test runner: executes the REFERENCE joi library
// (/root/reference/lib, loaded read-only via the hand-written @hapi shims
// in ./node_modules) over (manifest, prefs, rows) requests so joi_ray's
// results can be diffed against the real implementation.
//
// Protocol (line-delimited JSON on stdin/stdout):
//   request : {"id": N, "manifest": <describe() output> | null,
//              "prefs": {<joi camelCase prefs>}, "rows": [<row>, ...]}
//   response: {"id": N, "ok": true, "results": [{"value": V,
//              "errors": [{"path": [...], "type": code, "message": m}]|null,
//              "warnings": [...]|null}, ...]}
//           | {"id": N, "ok": false, "error": "..."}
//
// Non-JSON JS values cross the pipe as markers (both directions):
//   undefined -> {"$undef": true}      NaN      -> {"$nan": true}
//   Date      -> {"$date": epochMs}    +/-Inf   -> {"$inf": 1|-1}
//   Buffer    -> {"$bin": base64}      -0       -> {"$negz": true}

const readline = require('readline');
const Joi = require('/root/reference/lib');

const deser = (v) => {
    if (v === null || typeof v !== 'object') return v;
    if (Array.isArray(v)) return v.map(deser);
    if (v.$undef) return undefined;
    if (v.$nan) return NaN;
    if (v.$inf) return v.$inf > 0 ? Infinity : -Infinity;
    if (v.$negz) return -0;
    if (v.$date !== undefined) return new Date(v.$date);
    if (v.$bin !== undefined) return Buffer.from(v.$bin, 'base64');
    const o = {};
    for (const k of Object.keys(v)) o[k] = deser(v[k]);
    return o;
};

const ser = (v) => {
    if (v === undefined) return { $undef: true };
    if (v === null) return null;
    if (typeof v === 'number') {
        if (Number.isNaN(v)) return { $nan: true };
        if (!Number.isFinite(v)) return { $inf: v > 0 ? 1 : -1 };
        if (Object.is(v, -0)) return { $negz: true };
        return v;
    }
    if (typeof v === 'bigint') return Number(v);
    if (v instanceof Date) return { $date: v.getTime() };
    if (Buffer.isBuffer(v)) return { $bin: v.toString('base64') };
    if (Array.isArray(v)) return v.map(ser);
    if (typeof v === 'object') {
        const o = {};
        for (const k of Object.keys(v)) {
            if (v[k] !== undefined) o[k] = ser(v[k]);
        }
        return o;
    }
    if (typeof v === 'symbol' || typeof v === 'function') return { $js: String(v) };
    return v;
};

// -- builder-call specs -------------------------------------------------
// A spec constructs a schema through the PUBLIC Joi API (no manifest
// translation, so joi's own call-time rewrites — e.g. base.js:319-366
// when() -> alternatives — run authentically):
//   {"t": "number", "a": [...ctor args], "c": [["min", 2], ["when", {...}]]}
// Args may contain markers: {"$s": spec} nested schema, {"$ref": "path",
// "$o": {...}} a Joi.ref, {"$re": "pat", "$f": "i"} a RegExp, {"$kw": {..}}
// a trailing options object, plus the value markers above.

// Named fork/alter adjusters ({"$adj": name} markers) — functions cannot
// cross the JSON pipe, so both sides resolve them from this shared catalog
// (python mirror: tools/diffref.py _ADJUSTERS).
const ADJUSTERS = {
    required: (s) => s.required(),
    optional: (s) => s.optional(),
    forbidden: (s) => s.forbidden(),
    strip: (s) => s.strip(),
    raw: (s) => s.raw(),
    min2: (s) => s.min(2),
};

// Function default/failover catalog ({"$dflt": name} markers) — run per
// missing/failed value (validator.js:451-475).  Python mirror:
// tools/diffref.py _DFLT_FNS.  Deterministic only (the diff compares
// converted values).
const DFLT_FNS = {
    const7: () => 7,
    strq: () => 'q7',
    parent_a2: (parent, prefs) => (parent && typeof parent.a === 'number' ? parent.a * 2 : 0),
    thrower: (parent, prefs) => { throw new Error('fuzz boom'); },
};

// Joi.extend catalog: custom types registered through the reference's
// public extension machinery (lib/extend.js) so fuzzed schemas exercise
// extended-type rule dispatch authentically.  Python mirror:
// tools/diffref.py registers the same rules/messages via
// joi_ray.extend.register_rule.
const EXT_TYPES = new Set(['xnum', 'xstr']);
const ExtJoi = Joi.extend(
    {
        type: 'xnum',
        base: Joi.number(),
        messages: { 'xnum.even': '{{#label}} must be an even number' },
        rules: {
            even: {
                validate(value, helpers) {
                    return value % 2 === 0 ? value : helpers.error('xnum.even');
                },
            },
        },
    },
    {
        type: 'xstr',
        base: Joi.string(),
        messages: {
            'xstr.vowelstart': '{{#label}} must start with a vowel',
            'xstr.maxwords': '{{#label}} must have at most {{#limit}} words',
        },
        rules: {
            vowelstart: {
                validate(value, helpers) {
                    return /^[aeiou]/i.test(value) ? value : helpers.error('xstr.vowelstart');
                },
            },
            maxwords: {
                method(limit) {
                    return this.$_addRule({ name: 'maxwords', args: { limit } });
                },
                args: ['limit'],
                validate(value, helpers, args) {
                    const words = value.split(/\s+/).filter((w) => w.length).length;
                    return words <= args.limit ? value : helpers.error('xstr.maxwords', { limit: args.limit });
                },
            },
        },
    }
);

const convArg = (v) => {
    if (v === null || typeof v !== 'object') return v;
    if (Array.isArray(v)) return v.map(convArg);
    if (v.$s !== undefined) return buildSpec(v.$s);
    if (v.$ref !== undefined) return Joi.ref(v.$ref, convArg(v.$o || {}));
    if (v.$re !== undefined) return new RegExp(v.$re, v.$f || '');
    if (v.$x !== undefined) return Joi.x(v.$x);  // template (Joi.expression)
    if (v.$adj !== undefined) return ADJUSTERS[v.$adj];
    if (v.$dflt !== undefined) return DFLT_FNS[v.$dflt];
    if (v.$kw !== undefined) return convArg(v.$kw);
    if (v.$undef || v.$nan || v.$inf || v.$negz || v.$date !== undefined || v.$bin !== undefined) return deser(v);
    const o = {};
    for (const k of Object.keys(v)) o[k] = convArg(v[k]);
    return o;
};

const buildSpec = (spec) => {
    if (spec === null || typeof spec !== 'object' || Array.isArray(spec)) return spec;  // literal sugar
    const root = EXT_TYPES.has(spec.t) ? ExtJoi : Joi;
    let s = root[spec.t](...(spec.a || []).map(convArg));
    for (const call of spec.c || []) {
        const [name, ...args] = call;
        s = s[name](...args.map(convArg));
    }
    return s;
};

const details = (err) => {
    if (!err) return null;
    return err.details.map((d) => ({
        path: d.path,
        type: d.type,
        message: d.message,
    }));
};

const rl = readline.createInterface({ input: process.stdin, terminal: false });
rl.on('line', (line) => {
    if (!line.trim()) return;
    let req;
    try {
        req = JSON.parse(line);
    } catch (e) {
        process.stdout.write(JSON.stringify({ id: null, ok: false, error: 'bad json: ' + e.message }) + '\n');
        return;
    }
    try {
        const schema = req.spec !== undefined ? buildSpec(req.spec) : Joi.build(req.manifest);
        const prefs = deser(req.prefs || {});
        const results = [];
        for (const raw of req.rows) {
            const row = deser(raw);
            const r = schema.validate(row, prefs);
            results.push({
                value: ser(r.value),
                errors: details(r.error),
                warnings: r.warning ? details(r.warning) : null,
            });
        }
        process.stdout.write(JSON.stringify({ id: req.id, ok: true, results }) + '\n');
    } catch (e) {
        process.stdout.write(JSON.stringify({ id: req.id, ok: false, error: String(e && e.stack || e) }) + '\n');
    }
});
