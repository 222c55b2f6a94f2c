/* Harness shim for `csv-parse/lib/sync` — just the call shape the
 * reference CLI uses: parse(text, {delimiter, columns: true,
 * trim: true, auto_parse: false}) -> array of row objects.
 * RFC 4180 quoting is supported (quoted fields, doubled quotes,
 * embedded delimiters/newlines); auto_parse is ignored because the
 * reference always passes false. Hand-rolled and faster than the real
 * csv-parse, which biases the head-to-head benchmark TOWARD the
 * reference. */
'use strict';

module.exports = function parse(input, options) {
  var text = Buffer.isBuffer(input) ? input.toString('utf8') : String(input);
  var delim = (options && options.delimiter) || ',';
  var trim = !!(options && options.trim);
  var rows = [];
  var field = '';
  var record = [];
  var inQuotes = false;
  var i = 0, n = text.length;

  function endField() {
    record.push(trim ? field.trim() : field);
    field = '';
  }
  function endRecord() {
    endField();
    // skip completely empty trailing lines
    if (record.length > 1 || record[0] !== '') rows.push(record);
    record = [];
  }

  while (i < n) {
    var c = text[i];
    if (inQuotes) {
      if (c === '"') {
        if (text[i + 1] === '"') { field += '"'; i += 2; continue; }
        inQuotes = false; i++; continue;
      }
      field += c; i++; continue;
    }
    if (c === '"' && field === '') { inQuotes = true; i++; continue; }
    if (c === delim) { endField(); i++; continue; }
    if (c === '\n') { endRecord(); i++; continue; }
    if (c === '\r') {
      if (text[i + 1] === '\n') i++;
      endRecord(); i++; continue;
    }
    field += c; i++;
  }
  if (field !== '' || record.length > 0) endRecord();

  if (options && options.columns) {
    var header = rows.shift() || [];
    return rows.map(function (r) {
      var obj = {};
      for (var j = 0; j < header.length; j++) obj[header[j]] = r[j];
      return obj;
    });
  }
  return rows;
};
