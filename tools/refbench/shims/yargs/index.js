/* Harness shim for `yargs` — just the chain the reference CLI builds:
 * .usage().demand(1).boolean('d').alias().describe().boolean('i')
 * .boolean('v').help('h').alias().argv with -d/-i/-v boolean flags
 * and one positional argument. */
'use strict';

var chain = {
  usage: function () { return chain; },
  demand: function () { return chain; },
  boolean: function () { return chain; },
  alias: function () { return chain; },
  describe: function () { return chain; },
  help: function () { return chain; }
};

Object.defineProperty(chain, 'argv', {
  get: function () {
    var argv = { _: [], d: false, i: false, v: false };
    var args = process.argv.slice(2);
    for (var k = 0; k < args.length; k++) {
      var a = args[k];
      if (a === '-d' || a === '--date') argv.d = true;
      else if (a === '-i' || a === '--index') argv.i = true;
      else if (a === '-v') argv.v = true;
      else if (a[0] === '-' && a.length > 1 && a[1] !== '-') {
        // combined short flags, e.g. -div
        for (var j = 1; j < a.length; j++) {
          if (a[j] === 'd') argv.d = true;
          else if (a[j] === 'i') argv.i = true;
          else if (a[j] === 'v') argv.v = true;
        }
      } else argv._.push(a);
    }
    if (argv._.length < 1) {
      console.error('Usage: collimate [options] <file>');
      process.exit(1);
    }
    return argv;
  }
});

module.exports = chain;
