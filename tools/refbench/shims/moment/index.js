/* Harness shim for the `moment` npm package — JUST the surface the
 * reference CLI uses (`moment(value, format, true)` strict parse,
 * `.isValid()`, `.format("YYYY-MM-DD")`), reimplemented from the
 * public moment.js API docs so the reference can run in this
 * zero-egress container. Deliberately minimal and FASTER than real
 * moment (no locale machinery, no mutability plumbing), which biases
 * the head-to-head benchmark TOWARD the reference — any
 * "matches-or-beats" conclusion drawn from it is conservative.
 *
 * Strict-parse semantics per the moment docs: format tokens must
 * match exactly (M/D accept 1-2 digits, YYYY exactly 4; separators
 * literal; no leftover input) and the result must be a real calendar
 * date (2023-02-30 is invalid).
 */
'use strict';

var DAYS = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31];

function daysIn(y, m) {
  if (m === 2 && ((y % 4 === 0 && y % 100 !== 0) || y % 400 === 0)) return 29;
  return DAYS[m - 1];
}

// format -> [order of fields, separator]; order entries are 'Y','M','D'
var FORMATS = {
  'YYYY-M-D': ['Y', 'M', 'D', '-'],
  'YYYY/M/D': ['Y', 'M', 'D', '/'],
  'D-M-YYYY': ['D', 'M', 'Y', '-'],
  'D/M/YYYY': ['D', 'M', 'Y', '/'],
  'M-D-YYYY': ['M', 'D', 'Y', '-'],
  'M/D/YYYY': ['M', 'D', 'Y', '/']
};

function parseStrict(value, format) {
  var spec = FORMATS[format];
  if (!spec || typeof value !== 'string') return null;
  var parts = value.split(spec[3]);
  if (parts.length !== 3) return null;
  var y = 0, m = 0, d = 0;
  for (var i = 0; i < 3; i++) {
    var p = parts[i];
    if (!/^[0-9]+$/.test(p)) return null;
    var want = spec[i];
    if (want === 'Y') {
      if (p.length !== 4) return null;
      y = +p;
    } else {
      if (p.length < 1 || p.length > 2) return null;
      if (want === 'M') m = +p; else d = +p;
    }
  }
  if (m < 1 || m > 12) return null;
  if (d < 1 || d > daysIn(y, m)) return null;
  return { y: y, m: m, d: d };
}

function pad(n, w) {
  var s = '' + n;
  while (s.length < w) s = '0' + s;
  return s;
}

function Moment(parsed) { this._p = parsed; }
Moment.prototype.isValid = function () { return this._p !== null; };
Moment.prototype.format = function (fmt) {
  if (this._p === null) return 'Invalid date';
  var p = this._p;
  // the reference only ever formats ISO_DATE.slice(0, 10) = "YYYY-MM-DD"
  if (fmt === 'YYYY-MM-DD')
    return pad(p.y, 4) + '-' + pad(p.m, 2) + '-' + pad(p.d, 2);
  throw new Error('moment shim: unsupported format ' + fmt);
};

module.exports = function moment(value, format, strict) {
  if (strict !== true)
    throw new Error('moment shim: only strict parse supported');
  return new Moment(parseStrict(value, format));
};
