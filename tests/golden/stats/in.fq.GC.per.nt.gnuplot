set output '<OUTDIR>/in.fq.GC.per.nt.png'
set terminal png nocrop enhanced font arial 10 size 640,360
set ylabel 'GC content (%)'
set xlabel 'Nucleotide position'
set ytics border in scale 1,0.5 mirror norotate  offset character 0, 0, 0
set title 'GC Content per Nucleotide Position'
set xrange [ 0 : 59 ] noreverse nowriteback
set autoscale y
set lmargin '10'
set rmargin '4'
set tmargin '3'
set bmargin '4'
plot '<OUTDIR>/in.fq.GC.per.nt.data' using 1:2 title '' with lines
